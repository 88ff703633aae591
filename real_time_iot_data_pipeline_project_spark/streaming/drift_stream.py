"""Streaming drift alarm (X34): the snapshot drift monitor
(operators/drift.py) as a foreachBatch sink — PSI of the accumulated
stream against a FROZEN baseline distribution, updated every
micro-batch.

Why it folds exactly: the PSI pipeline's only data-sized stage is the
(feature, bin) cell count, and integer counts are exactly mergeable —
so the monitor stores only the ≤ features·bins cumulative counts
(plus the baseline's, computed once), and the report hands the folded
cells to the SAME ``psi_from_cells`` arithmetic the batch report
uses. Stream PSI therefore equals the batch ``psi_report(baseline,
concatenated_stream)`` EXACTLY, not approximately (tested).

State: a tiny JSON file (atomic tmp+rename), batch_id-guarded with the
same exactly-once/mismatch contract as the streaming heavy-hitters
fold (skip an exact replay, raise on a behind-horizon id — state and
checkpoint must live and die together). Per-batch driver work is the
bounded cell collect; nothing driver-side is data-sized.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession

from ..operators import drift


class StreamingDriftMonitor:
    """foreachBatch sink accumulating (feature, bin) counts and
    reporting PSI vs a frozen baseline.

    Usage::

        mon = StreamingDriftMonitor(features, baseline_df, state_path)
        q = (stream.writeStream.foreachBatch(mon.process_batch)
             .option("checkpointLocation", ckpt).start())
        ...
        mon.report(spark)   # (feature, psi, verdict) — live
    """

    def __init__(self, features: dict[str, Column],
                 baseline: DataFrame, state_path: str):
        if not features:
            raise ValueError("features must name at least one binned column")
        self.features = features
        self.state_path = state_path
        if not os.path.exists(state_path):
            # baseline cells computed ONCE (bounded collect: ≤
            # features·bins rows) and frozen into the state file
            base = drift.bin_cells(
                baseline, baseline.limit(0), features).collect()
            self._store({
                "baseline": [[r["feature"], r["bin"], r["n_a"]]
                             for r in base],
                "stream": [],
                "last_batch_id": -1,
            })

    # -- state ---------------------------------------------------------
    def _load(self) -> dict:
        with open(self.state_path) as f:
            return json.load(f)

    def _store(self, state: dict) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.state_path)

    # -- the foreachBatch hook -----------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        state = self._load()
        if batch_id == state["last_batch_id"]:
            return  # replay of the last uncommitted batch: already folded
        if batch_id != state["last_batch_id"] + 1:
            # sequential-id contract, both directions (see
            # heavy_stream.process_batch): behind = fresh checkpoint on
            # old state (double-count), ahead = fresh state on an
            # advanced checkpoint (silently missing batches — the
            # stream==batch equality claim would be false)
            raise ValueError(
                f"batch_id {batch_id} does not follow the fold horizon "
                f"{state['last_batch_id']} at {self.state_path} — this "
                "state belongs to a different checkpoint; use a fresh "
                "state path with a fresh checkpointLocation")
        cells = drift.bin_cells(
            batch_df.limit(0), batch_df, self.features).collect()
        counts = {(f, b): n for f, b, n in state["stream"]}
        for r in cells:
            key = (r["feature"], r["bin"])
            counts[key] = counts.get(key, 0) + int(r["n_b"])
        state["stream"] = [[f, b, n] for (f, b), n in counts.items()]
        state["last_batch_id"] = batch_id
        self._store(state)

    # -- reader ----------------------------------------------------------
    def report(self, spark: SparkSession) -> DataFrame:
        """(feature, psi, verdict) of the accumulated stream vs the
        frozen baseline — EXACTLY the batch psi_report on the
        concatenated stream, because the folded integers are the same
        cells and the arithmetic tail is the same code."""
        state = self._load()
        base = {(f, b): n for f, b, n in state["baseline"]}
        stream = {(f, b): n for f, b, n in state["stream"]}
        rows = [(f, b, base.get((f, b), 0), stream.get((f, b), 0))
                for (f, b) in sorted(set(base) | set(stream))]
        cells = spark.createDataFrame(
            rows, "feature string, bin string, n_a long, n_b long")
        return drift.psi_from_cells(cells)
