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
