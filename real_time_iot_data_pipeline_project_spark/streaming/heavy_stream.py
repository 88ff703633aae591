"""Streaming heavy hitters: the foreachBatch twin of the batch
Misra-Gries operator (operators/heavy.py) — the last batch-only
production operator closed (VERDICT r8 item 7).

Shape: each micro-batch runs the SAME distributed per-task weighted-MG
summary pass as the batch operator (``heavy.task_summaries`` — the
data-sized work stays on executors, no shuffle), and the driver folds
the ≤ (k+1)·tasks summary rows into a k-bounded persistent state via
the SAME ``_mg_update_weighted`` kernel. MG summaries are MERGEABLE
(Berinde et al. PODS'09; Agarwal et al., "Mergeable Summaries",
PODS'12): folding per-batch summaries through weighted MG preserves
the classic bound over the whole stream —

    true_count − n/(k+1)  ≤  estimate  ≤  true_count

so with k = ⌈1/support⌉ every value whose stream-wide frequency is
≥ support·n survives in the state (no-miss), exactly the batch
guarantee. Streaming cannot recount history, so the live state is
(candidates, lower-bound estimates, n); when the raw stream IS
retained (a corpus, an events table), :meth:`refine_exact` replays
phase 2 of the batch operator over it — semi-join recount + exact
integer threshold — and returns the EXACT heavy-hitter set, which
equals ``heavy_hitters(concatenated_stream)`` by construction (the
candidate superset makes the recount lossless; fold-oracle test in
tests/test_heavy.py).

Exactly-once: the state file carries ``last_batch_id``; a foreachBatch
replay of an already-folded batch is a no-op. Writes are atomic
(tmp + rename). State values must be JSON-representable (strings/ints
— the token/category shapes the operator targets).

Scale: per-batch driver work is O(k · tasks) summary rows and the
state is O(k) — both independent of batch size and stream length; the
only data-sized pass is the executor-side summary scan.
"""

from __future__ import annotations

import json
import os
from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession

from ..operators.heavy import (
    _mg_update_weighted,
    _support_fraction,
    support_capacity,
    task_summaries,
)


class StreamingHeavyHitters:
    """foreachBatch sink maintaining a k-bounded weighted-MG summary
    plus the exact non-null row count across micro-batches.

    Usage::

        shh = StreamingHeavyHitters("token", support=0.05,
                                    state_path="/data/hh_state.json")
        q = (stream_df.writeStream.foreachBatch(shh.process_batch)
             .option("checkpointLocation", ckpt).start())
        ...
        shh.estimates(spark)          # candidates + lower bounds, live
        shh.refine_exact(corpus_df)   # exact set, when raw data kept
    """

    def __init__(self, col: str, support: float, state_path: str):
        self.col = col
        self.frac: Fraction = _support_fraction(support)
        self.k = support_capacity(support)
        self.state_path = state_path

    # -- state ---------------------------------------------------------
    def _load(self) -> dict:
        if not os.path.exists(self.state_path):
            return {"counters": [], "n": 0, "last_batch_id": -1,
                    "k": self.k}
        with open(self.state_path) as f:
            state = json.load(f)
        if state.get("k") != self.k:
            raise ValueError(
                f"state at {self.state_path} was built with "
                f"k={state.get('k')}, operator configured k={self.k} — "
                "a support change needs a fresh state path")
        return state

    def _store(self, state: dict) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.state_path)

    # -- the foreachBatch hook -----------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        state = self._load()
        if batch_id == state["last_batch_id"]:
            return  # replayed batch after restart: already folded
        if batch_id != state["last_batch_id"] + 1:
            # Structured Streaming batch ids are sequential, and a
            # restart replays at most the LAST uncommitted batch (the
            # == case above) — so any other id means the state file is
            # paired with a DIFFERENT checkpoint: behind-horizon =
            # fresh checkpoint restarted at 0 (folding would
            # double-count), forward gap = fresh/lost state attached
            # to an advanced checkpoint (batches 0..id-1 would be
            # silently missing and the no-miss guarantee voided).
            # State and checkpointLocation must live and die together.
            raise ValueError(
                f"batch_id {batch_id} does not follow the state's "
                f"fold horizon {state['last_batch_id']} at "
                f"{self.state_path} — this state file belongs to a "
                "different checkpoint; start a fresh state path with "
                "a fresh checkpointLocation (or restore the matching "
                "state/checkpoint pair)")
        # executor-side: the SAME per-task weighted-MG pass as batch
        # heavy_hitters; driver sees only ≤ (k+1)·tasks summary rows
        # (bounded control-flow collect, like upsert/scd2 bucket ids)
        rows = task_summaries(batch_df, self.col, self.k).collect()
        counters = {entry[0]: entry[1] for entry in state["counters"]}
        n = state["n"]
        for r in rows:
            v, w, pn = r[self.col], r["__w"], r["__pn"]
            if v is None:
                n += int(pn)
            else:
                _mg_update_weighted(counters, v, int(w), self.k)
        self._store({"counters": [[v, w] for v, w in counters.items()],
                     "n": n, "last_batch_id": batch_id, "k": self.k})

    # -- readers -------------------------------------------------------
    def snapshot(self) -> tuple[dict, int]:
        """(counters value -> lower-bound estimate, total n)."""
        state = self._load()
        return {entry[0]: entry[1] for entry in state["counters"]}, \
            state["n"]

    def estimates(self, spark: SparkSession) -> DataFrame:
        """Live candidate estimates: (col, est_count, n, max_undercount)
        — est_count ≤ true count ≤ est_count + max_undercount, and
        every value with true frequency ≥ support is present."""
        counters, n = self.snapshot()
        bound = n // (self.k + 1)
        rows = [(v, int(w), int(n), int(bound))
                for v, w in counters.items()]
        # JSON state holds str or int values — pick the matching type
        vtype = "long" if rows and all(
            isinstance(v, int) for v in counters) else "string"
        schema = (f"{self.col} {vtype}, est_count long, n long, "
                  "max_undercount long")
        return spark.createDataFrame(rows, schema)

    def refine_exact(self, df: DataFrame) -> DataFrame:
        """Phase 2 of the batch operator over retained raw data
        ``df``: exact recount of the stream-discovered candidates +
        exact integer threshold. Because the streaming candidates are a
        superset of the true heavy hitters of everything folded, this
        equals ``heavy_hitters(df, col, support)`` when ``df`` is the
        concatenated stream (fold-oracle test)."""
        from pyspark.sql import functions as F

        counters, _ = self.snapshot()
        spark = df.sparkSession
        cand = spark.createDataFrame(
            [(v,) for v in counters], df.select(self.col).schema)
        nn = df.where(F.col(self.col).isNotNull())
        counted = (nn.join(F.broadcast(cand), self.col, "left_semi")
                   .groupBy(self.col)
                   .agg(F.count(F.lit(1)).alias("count")))
        total = nn.agg(F.count(F.lit(1)).alias("__n"))
        return (counted.crossJoin(F.broadcast(total))
                .where(F.col("count") * F.lit(self.frac.denominator)
                       >= F.lit(self.frac.numerator) * F.col("__n"))
                .select(self.col, "count"))
