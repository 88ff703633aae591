"""Deterministic distributed heavy hitters (frequent items).

The 100 TB problem: find every value of a HIGH-cardinality column with
frequency ≥ ``support`` · n. A plain ``groupBy(col).count()`` shuffles
the full cardinality (the aggregation hash table is domain-sized); a
sketch (count-min / SpaceSaving) bounds memory but returns
partition-order-dependent estimates that no cross-engine oracle can
value-check.

This operator gets BOTH properties — bounded state and exact,
deterministic output — with the classic two-phase Misra-Gries scheme,
in exactly TWO scans of the data:

1. **Candidate + totals pass** (``mapInPandas``, one scan, no
   shuffle): each partition runs a Misra-Gries summary of capacity
   k = ⌈1/support⌉ and emits its ≤ k candidate values plus ONE marker
   row carrying the partition's row count. The ≤ (k+1)·tasks-row
   summary is materialized (``localCheckpoint``) so candidates and
   totals both read it without rescanning the data.

   *No-miss guarantee*: Misra-Gries undercounts any item by at most
   n_p/k on a partition of n_p rows, so an item absent from EVERY
   partition's summary has count < n_p/k on each, hence global count
   < Σ n_p/k = n/k ≤ support·n. Every true heavy hitter therefore
   survives into the candidate union.

2. **Exact pass** (one scan + one bounded shuffle): the candidate
   union (≤ k · num_partitions values) is semi-joined back onto the
   data (Catalyst auto-broadcasts it for any sane support, and may
   fall back to a shuffled semi-join for extreme ones rather than OOM
   the driver); the exact count runs only over candidate rows, so the
   aggregation hash table is candidate-sized, never domain-sized.
   False candidates are discarded by the final
   ``count ≥ ⌈support·n⌉`` filter.

The output is the EXACT heavy-hitter set with EXACT counts — identical
to ``GROUP BY ... HAVING count >= ceil(support*n)`` run by any engine,
which is precisely the DuckDB oracle registry q114/q115 use.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _misra_gries_candidates(values, k: int) -> list:
    """Classic Misra-Gries: maintain ≤ k counters; decrement all when a
    new value arrives with the table full. Survivors = candidates."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = [c for c in counters if counters[c] == 1]
            for c in counters:
                counters[c] -= 1
            for c in dead:
                del counters[c]
    return list(counters)


def _mg_update(counters: dict, v, k: int) -> None:
    if v in counters:
        counters[v] += 1
    elif len(counters) < k:
        counters[v] = 1
    else:
        dead = [c for c in counters if counters[c] == 1]
        for c in counters:
            counters[c] -= 1
        for c in dead:
            del counters[c]


def _is_null(v) -> bool:
    return v is None or (isinstance(v, float) and pd.isna(v))


def heavy_hitters(df: DataFrame, col: str, support: float) -> DataFrame:
    """Exact frequent items: every value of ``col`` occurring in at
    least ``support`` (0 < support ≤ 1) of the rows, with its exact
    count — computed with candidate-bounded state in two data scans
    (see module doc). Null values — and NaN floats, which behave as
    nulls here — are ignored (SQL COUNT semantics: a null is not a
    value). Returns (col, count) rows; ties and order
    are exact, so the result is engine-independent."""
    if not (0.0 < support <= 1.0):
        raise ValueError(f"support must be in (0, 1], got {support}")
    k = math.ceil(1.0 / support)
    out_schema = T.StructType([
        T.StructField(col, df.schema[col].dataType),
        T.StructField("__pn", T.LongType()),  # marker rows: partition n
    ])

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one Misra-Gries summary per TASK plus the partition row count
        # — candidates carry __pn NULL, the single marker row carries
        # (NULL value, n_p); input nulls are filtered upstream so a
        # NULL value column unambiguously marks the total row
        counters: dict = {}
        n_p = 0
        for pdf in batches:
            for v in pdf[col]:
                if _is_null(v):
                    continue
                n_p += 1
                _mg_update(counters, v, k)
        yield pd.DataFrame({col: list(counters) + [None],
                            "__pn": [None] * len(counters) + [n_p]})

    summary = (df.select(col).where(F.col(col).isNotNull())
               .mapInPandas(summarize, schema=out_schema)
               # ≤ (k+1)·tasks rows: materialize once so candidates and
               # totals both derive from ONE scan of the data
               .localCheckpoint(eager=True))
    cand = summary.where(F.col(col).isNotNull()).select(col).distinct()
    total = summary.agg(F.sum("__pn").alias("__n"))
    counted = (
        df.where(F.col(col).isNotNull())
        .join(cand, col, "left_semi")
        .groupBy(col).agg(F.count(F.lit(1)).alias("count"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col("count") >= F.ceil(F.lit(support) * F.col("__n")))
        .select(col, "count")
    )


def grouped_heavy_hitters(df: DataFrame, group_cols: list[str], col: str,
                          support: float) -> DataFrame:
    """Per-group exact frequent items: for each group, every value of
    ``col`` occurring in ≥ ``support`` of THAT GROUP's (non-null) rows,
    with its exact count — the per-source boilerplate-detection shape
    (which header/license/separator tokens dominate each corpus
    source?).

    Same two-scan scheme as :func:`heavy_hitters`, with the
    Misra-Gries no-miss bound applied per (partition, group): each task
    keeps one capacity-k summary per group it sees (task state
    O(groups-in-partition · k)) and emits one per-group total marker.
    The exact recount joins candidates on (group, value), keeping the
    aggregation candidate-sized; the threshold compares against each
    group's own total. Output: group_cols + (col, count),
    engine-independent. Rows with null group keys are excluded (join
    equality semantics, matching the SQL oracle's GROUP BY/JOIN)."""
    if not (0.0 < support <= 1.0):
        raise ValueError(f"support must be in (0, 1], got {support}")
    k = math.ceil(1.0 / support)
    fields = [T.StructField(g, df.schema[g].dataType) for g in group_cols]
    fields.append(T.StructField(col, df.schema[col].dataType))
    fields.append(T.StructField("__pn", T.LongType()))
    out_schema = T.StructType(fields)

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summaries: dict = {}   # group key tuple -> MG counters
        group_n: dict = {}     # group key tuple -> partition row count
        for pdf in batches:
            gvals = [pdf[g] for g in group_cols]
            for i, v in enumerate(pdf[col]):
                if _is_null(v):
                    continue
                gk = tuple(gv.iloc[i] for gv in gvals)
                group_n[gk] = group_n.get(gk, 0) + 1
                _mg_update(summaries.setdefault(gk, {}), v, k)
        rows = [(*gk, v, None) for gk, counters in summaries.items()
                for v in counters]
        rows += [(*gk, None, n) for gk, n in group_n.items()]
        yield pd.DataFrame(rows, columns=[*group_cols, col, "__pn"])

    nn = df.where(F.col(col).isNotNull())
    summary = (nn.select(*group_cols, col)
               .mapInPandas(summarize, schema=out_schema)
               .localCheckpoint(eager=True))
    cand = (summary.where(F.col(col).isNotNull())
            .select(*group_cols, col).distinct())
    totals = (summary.where(F.col(col).isNull())
              .groupBy(*group_cols).agg(F.sum("__pn").alias("__n")))
    counted = (
        nn.join(cand, [*group_cols, col], "left_semi")
        .groupBy(*group_cols, col).agg(F.count(F.lit(1)).alias("count"))
    )
    return (
        counted.join(totals, group_cols)
        .where(F.col("count") >= F.ceil(F.lit(support) * F.col("__n")))
        .select(*group_cols, col, "count")
    )
