"""Warehouse history maintenance: CDC changelog compaction and
SCD Type-2 dimension building.

The reference's DWH load is full-refresh batch (`DWH.ipynb` star load,
SURVEY §3.2); real warehouses ingest *changelogs* and keep *history*.
This module adds the two canonical shapes:

- ``cdc_latest_snapshot`` — MERGE-style compaction of an ordered
  changelog (upserts + tombstone deletes) into the current snapshot.
- ``scd2_from_history`` — Slowly-Changing-Dimension Type 2: collapse an
  attribute's change history into validity intervals
  ``[effective_from, effective_to)`` with a current-row flag.
- ``scd2_apply_increment`` — incremental SCD2 maintenance: fold a new
  batch of observations into an existing dimension WITHOUT re-reading
  history (rebuild cost tracks the increment + touched current rows,
  never the accumulated dimension).

Scale notes (the 100 TB shapes):

- CDC compaction is ONE partial-aggregatable shuffle: ``max_by`` over a
  struct ordering gives latest-wins per key with map-side combine — no
  window sort over the full changelog. At 100 TB of changelog the
  map-side combine collapses each task's input to one row per key
  before the exchange.
- SCD2 is one shuffle on the key: both window passes (change detection
  via ``lag``, interval close via ``lead``) share the same
  ``partitionBy(key) orderBy(ts)`` exchange; the filter between them
  only narrows rows. No groupBy on a derived island key (that would be
  a second, differently-keyed shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_latest_snapshot(changelog: DataFrame, key_cols: list[str],
                        order_cols: list[str], op_col: str,
                        delete_op: str = "D") -> DataFrame:
    """Compact an ordered changelog into the current snapshot
    (MERGE INTO ... WHEN MATCHED UPDATE / DELETE semantics, applied
    log-style).

    Each row is one operation on ``key_cols``; ``order_cols`` must be a
    total order within a key (pass a unique tiebreaker last — ties are
    otherwise nondeterministic). The latest operation wins; keys whose
    latest operation is ``delete_op`` are absent from the snapshot.

    Returns one row per surviving key: the full latest row plus
    ``n_ops`` (operations seen for the key, deletes included).

    Implementation: ``max_by(struct(*), struct(order_cols))`` — a
    partial-aggregatable aggregate, so the executor combines before the
    shuffle; deletes are filtered AFTER the winner is chosen (a delete
    must shadow earlier upserts, not lose to them).
    """
    payload = [c for c in changelog.columns if c not in key_cols]
    latest = changelog.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), F.struct(*order_cols)).alias("__last"),
        F.count(F.lit(1)).alias("n_ops"),
    )
    return (
        latest.filter(F.col(f"__last.{op_col}") != F.lit(delete_op))
        .select(*key_cols,
                *[F.col(f"__last.{c}").alias(c) for c in payload
                  if c != op_col],
                "n_ops")
    )


def scd2_from_history(history: DataFrame, key_cols: list[str], ts_col: str,
                      attr_col: str, tiebreak_col: str) -> DataFrame:
    """Build an SCD Type-2 dimension from an attribute change history.

    For each key, consecutive rows (ordered by ``ts_col, tiebreak_col``)
    carrying the SAME ``attr_col`` value collapse into one validity
    interval; a change opens a new one. Null attribute values are a
    legal state (null-safe comparison), ``ts_col`` must be non-null.

    Returns one row per interval: key cols, ``attr_col``,
    ``effective_from`` (first observation of the run),
    ``effective_to`` (start of the next run, null for the open one),
    ``version`` (1-based per key) and ``is_current``.

    The standard warehouse recipe (Kimball SCD2): detect changes with
    ``lag``, keep only run-opening rows, close each interval with
    ``lead`` — both windows on the same partitioning, one shuffle.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    prev_attr = F.lag(attr_col).over(w)
    prev_ts = F.lag(ts_col).over(w)
    opens = (
        history.withColumn(
            "__open",
            prev_ts.isNull() | ~F.col(attr_col).eqNullSafe(prev_attr))
        .filter(F.col("__open"))
    )
    return (
        opens.withColumn("effective_from", F.col(ts_col))
        .withColumn("effective_to", F.lead("effective_from").over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("effective_to").isNull())
        .select(*key_cols, attr_col, "effective_from", "effective_to",
                "version", "is_current")
    )


def scd2_lookup(facts: DataFrame, dim: DataFrame, key_cols: list[str],
                ts_col: str) -> DataFrame:
    """Resolve each fact row's dimension attributes AS OF its event
    time: equi-join on the key with the interval-containment predicate
    ``effective_from <= ts < effective_to`` (open intervals match
    everything from their start). Facts outside every interval (before
    a key's first observation, or unknown keys) drop out — inner-join
    semantics, matching the SQL formulation.

    Scale shape: the key equality carries the (single) shuffle; the
    interval predicates evaluate inside each key group — no interval
    fan-out. The dimension is deliberately NOT broadcast (per-key
    interval counts grow with history). The attribution core of
    registry q110."""
    f = facts.alias("f")
    d = dim.alias("d")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(f"f.{k}") == F.col(f"d.{k}"))
    cond = cond & (F.col(f"f.{ts_col}") >= F.col("d.effective_from")) & (
        F.col("d.effective_to").isNull()
        | (F.col(f"f.{ts_col}") < F.col("d.effective_to")))
    dim_cols = [c for c in dim.columns if c not in key_cols]
    return f.join(d, cond, "inner").select(
        *[F.col(f"f.{c}") for c in facts.columns],
        *[F.col(f"d.{c}") for c in dim_cols])


def scd2_snapshot_at(dim: DataFrame, at_ts) -> DataFrame:
    """Time-travel read: the dimension's state AS OF ``at_ts`` (a
    timestamp literal/Column) — one row per key whose history had begun
    by then. A pure filter (partition-pruning-friendly, no shuffle):
    ``effective_from <= at_ts < effective_to``."""
    at = F.lit(at_ts).cast("timestamp") if not isinstance(at_ts, F.Column) \
        else at_ts
    return dim.filter(
        (F.col("effective_from") <= at)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > at)))


def scd2_apply_increment(dim: DataFrame, increment: DataFrame,
                         key_cols: list[str], ts_col: str, attr_col: str,
                         tiebreak_col: str) -> DataFrame:
    """Incrementally maintain an SCD2 dimension: fold a new batch of
    observations into an existing ``scd2_from_history`` output without
    re-reading the underlying history.

    The append-only contract: every increment row's ``ts_col`` must be
    STRICTLY LATER than its key's current ``effective_from`` (validated
    — an earlier observation would rewrite closed history, and an
    equal-``ts`` one is order-ambiguous against the open row: the fold
    seeds the current row first regardless of tiebreak, while a full
    rebuild orders by (ts, tiebreak), so accepting it could diverge
    from the rebuild; ``streaming/scd2.py`` filters the same ``<=``
    predicate before calling here). Under that contract the result is
    row-identical to ``scd2_from_history`` over the concatenated
    history — pinned by tests and by registry q112, which runs the
    incremental path against the full-rebuild oracle.

    How: each key's CURRENT row acts as the seed observation (carrying
    its version); seed ∪ increment re-runs the same lag/lead/row_number
    recipe per key (seed ordered before equal-``ts`` increment rows);
    new versions continue from the seed's; closed intervals and keys
    untouched by the increment pass through unchanged. Cost: one
    shuffle of (touched current rows + increment) + a pass-through
    union — never O(accumulated history).
    """
    inc = increment.select(
        *key_cols, F.col(ts_col), F.col(attr_col), F.col(tiebreak_col))
    touched = inc.select(*key_cols).distinct()
    current = dim.filter(F.col("is_current"))
    cur_touched = current.join(touched, key_cols, "left_semi")

    # append-only validation: an increment row at or before its key's
    # open interval cannot be folded (earlier = belongs to closed
    # history; equal = order-ambiguous vs the seed, could diverge from
    # a full rebuild when the increment's tiebreak sorts first)
    stale = (inc.groupBy(*key_cols).agg(F.min(ts_col).alias("__min_ts"))
             .join(cur_touched.select(*key_cols, "effective_from"), key_cols)
             .filter(F.col("__min_ts") <= F.col("effective_from")))
    if stale.limit(1).count() > 0:
        raise ValueError(
            "increment contains observations at or earlier than a key's "
            "open interval — that rewrites closed history (or is "
            "order-ambiguous against the open row); run "
            "scd2_from_history over the full history instead")

    seed = cur_touched.select(
        *key_cols,
        F.col("effective_from").alias(ts_col),
        F.col(attr_col),
        F.lit(None).cast(inc.schema[tiebreak_col].dataType)
        .alias(tiebreak_col),
        F.col("version").alias("__seed_version"),
        F.lit(0).alias("__ord"),
    )
    obs = inc.select(
        *key_cols, ts_col, attr_col, tiebreak_col,
        F.lit(None).cast("int").alias("__seed_version"),
        F.lit(1).alias("__ord"),
    ).unionByName(seed)

    # one exchange: seed first within equal timestamps (__ord), then the
    # caller's tiebreak — the same total order a full rebuild derives
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col("__ord").asc(),
        F.col(tiebreak_col).asc_nulls_first())
    prev_attr = F.lag(attr_col).over(w)
    prev_ts = F.lag(ts_col).over(w)
    opens = (
        obs.withColumn(
            "__open",
            prev_ts.isNull() | ~F.col(attr_col).eqNullSafe(prev_attr))
        .filter(F.col("__open"))
    )
    base_version = F.first("__seed_version").over(
        Window.partitionBy(*key_cols).orderBy(
            F.col(ts_col).asc(), F.col("__ord").asc(),
            F.col(tiebreak_col).asc_nulls_first()))
    rebuilt = (
        opens.withColumn("effective_from", F.col(ts_col))
        .withColumn("effective_to", F.lead("effective_from").over(w))
        .withColumn(
            "version",
            F.coalesce(base_version, F.lit(1)).cast("int")
            + F.row_number().over(w) - F.lit(1))
        .withColumn("is_current", F.col("effective_to").isNull())
        .select(*key_cols, attr_col, "effective_from", "effective_to",
                "version", "is_current")
    )
    untouched = dim.join(touched, key_cols, "left_anti")
    closed_touched = (dim.filter(~F.col("is_current"))
                      .join(touched, key_cols, "left_semi"))
    return untouched.unionByName(closed_touched).unionByName(rebuilt)
