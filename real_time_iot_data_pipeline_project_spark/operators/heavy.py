"""Deterministic distributed heavy hitters (frequent items).

The 100 TB problem: find every value of a HIGH-cardinality column with
frequency ≥ ``support`` · n. A plain ``groupBy(col).count()`` shuffles
the full cardinality (the aggregation hash table is domain-sized); a
sketch (count-min / SpaceSaving) bounds memory but returns
partition-order-dependent estimates that no cross-engine oracle can
value-check.

This operator gets BOTH properties — bounded state and exact,
deterministic output — with the classic two-phase Misra-Gries scheme:

1. **Candidate pass** (``mapInPandas``, one scan, no shuffle): each
   partition runs a Misra-Gries summary of capacity k = ⌈1/support⌉
   and emits only its ≤ k candidate values.

   *No-miss guarantee*: Misra-Gries undercounts any item by at most
   n_p/k on a partition of n_p rows, so an item absent from EVERY
   partition's summary has count < n_p/k on each, hence global count
   < Σ n_p/k = n/k ≤ support·n. Every true heavy hitter therefore
   survives into the candidate union.

2. **Exact pass** (one scan + one bounded shuffle): the candidate
   union (≤ k · num_partitions values — broadcast-sized by
   construction) is broadcast-joined back onto the data; the exact
   count runs only over candidate rows, so the aggregation hash table
   is candidate-sized, never domain-sized. False candidates are
   discarded by the final ``count ≥ ⌈support·n⌉`` filter.

The output is the EXACT heavy-hitter set with EXACT counts — identical
to ``GROUP BY ... HAVING count >= ceil(support*n)`` run by any engine,
which is precisely the DuckDB oracle registry q114 uses.
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


def heavy_hitters(df: DataFrame, col: str, support: float) -> DataFrame:
    """Exact frequent items: every value of ``col`` occurring in at
    least ``support`` (0 < support ≤ 1) of the rows, with its exact
    count — computed with candidate-bounded state (see module doc).
    Null values are ignored (SQL COUNT semantics: a null is not a
    value). Returns (col, count) rows; ties and order are exact, so
    the result is engine-independent."""
    if not (0.0 < support <= 1.0):
        raise ValueError(f"support must be in (0, 1], got {support}")
    k = math.ceil(1.0 / support)
    field = df.schema[col]
    out_schema = T.StructType([T.StructField(col, field.dataType)])

    def candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one Misra-Gries summary per TASK (stream all Arrow batches of
        # the partition through it), ≤ k candidate rows out
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
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
        yield pd.DataFrame({col: list(counters)})

    cand = df.select(col).where(F.col(col).isNotNull()) \
        .mapInPandas(candidates, schema=out_schema).distinct()
    # exact pass: count ONLY candidate rows — the semi-join keeps the
    # aggregation candidate-sized; total n is a map-side agg. The
    # candidate set is ≤ k · num_partitions rows, so Catalyst
    # auto-broadcasts it for any sane support; the broadcast is NOT
    # forced because a tiny support on a many-partition cluster (e.g.
    # support=1e-5 × 2000 tasks → 200M candidates) must be allowed to
    # fall back to a shuffled semi-join instead of OOMing the driver.
    counted = (
        df.where(F.col(col).isNotNull())
        .join(cand, col, "left_semi")
        .groupBy(col).agg(F.count(F.lit(1)).alias("count"))
    )
    total = df.where(F.col(col).isNotNull()).agg(
        F.count(F.lit(1)).alias("__n"))
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

    Same two-phase scheme as :func:`heavy_hitters`, with the
    Misra-Gries no-miss bound applied per (partition, group): each task
    keeps one capacity-k summary per group it sees, so task state is
    O(groups-in-partition · k). The exact recount joins candidates on
    (group, value), keeping the aggregation candidate-sized; the
    threshold compares against each group's own total. Output:
    group_cols + (col, count), engine-independent."""
    if not (0.0 < support <= 1.0):
        raise ValueError(f"support must be in (0, 1], got {support}")
    k = math.ceil(1.0 / support)
    fields = [T.StructField(g, df.schema[g].dataType) for g in group_cols]
    fields.append(T.StructField(col, df.schema[col].dataType))
    out_schema = T.StructType(fields)

    def candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summaries: dict = {}  # group key tuple -> MG counters
        for pdf in batches:
            gvals = [pdf[g] for g in group_cols]
            for i, v in enumerate(pdf[col]):
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                gk = tuple(gv.iloc[i] for gv in gvals)
                counters = summaries.setdefault(gk, {})
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
        rows = [(*gk, v) for gk, counters in summaries.items()
                for v in counters]
        yield pd.DataFrame(rows, columns=[*group_cols, col])

    nn = df.where(F.col(col).isNotNull())
    cand = (nn.select(*group_cols, col)
            .mapInPandas(candidates, schema=out_schema).distinct())
    counted = (
        nn.join(cand, [*group_cols, col], "left_semi")
        .groupBy(*group_cols, col).agg(F.count(F.lit(1)).alias("count"))
    )
    totals = nn.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    return (
        counted.join(totals, group_cols)
        .where(F.col("count") >= F.ceil(F.lit(support) * F.col("__n")))
        .select(*group_cols, col, "count")
    )
