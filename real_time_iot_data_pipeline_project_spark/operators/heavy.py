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
   row carrying the partition's row count. Each Arrow batch is first
   pre-aggregated with pandas ``value_counts`` (vectorized C path) and
   the summary is updated with WEIGHTED Misra-Gries over the distinct
   (value, weight) pairs — the Python-level loop runs over distinct
   values per batch, not rows. The ≤ (k+1)·tasks-row summary is
   materialized (``localCheckpoint``) so candidates and totals both
   read it without rescanning the data.

   *No-miss guarantee*: each weighted decrement step subtracts some
   mass d from all k counters AND d from the incoming item's weight,
   removing d·(k+1) total mass; the total mass is n_p, so the sum of
   decrements on a partition is < n_p/(k+1) < n_p/k. An item absent
   from EVERY partition's summary therefore has count < n_p/k on each,
   hence global count < Σ n_p/k = n/k ≤ support·n. Every true heavy
   hitter survives into the candidate union. (Weighted MG with
   batch pre-aggregation is count-preserving, so the bound is the
   classic one — see Misra & Gries 1982; Berinde et al. PODS'09 for
   the weighted/merged form.)

2. **Exact pass** (one scan + one bounded shuffle): the candidate
   union (≤ k · num_partitions values) is semi-joined back onto the
   data (Catalyst auto-broadcasts it for any sane support, and may
   fall back to a shuffled semi-join for extreme ones rather than OOM
   the driver); the exact count runs only over candidate rows, so the
   aggregation hash table is candidate-sized, never domain-sized.
   False candidates are discarded by the final threshold filter.

**Threshold exactness.** ``support`` is interpreted as the decimal the
caller wrote, via ``Fraction(str(support)) = num/den``, and the filter
``count ≥ ⌈support·n⌉`` is evaluated in INTEGER arithmetic as
``count·den ≥ num·n`` (equivalent for integer count). IEEE-double
``ceil(support*n)`` would silently shift the cutoff for
non-representable supports — e.g. 0.07·100 = 7.000000000000001 in
doubles, so ``ceil`` gives 8 and excludes an item at exactly the
documented 7% frequency. The SQL oracles (registry q114/q115) use the
same integer form, so both engines agree at the boundary by
construction, not by luck.

The output is the EXACT heavy-hitter set with EXACT counts — identical
to ``GROUP BY ... HAVING count*den >= num*n`` run by any engine,
which is precisely the DuckDB oracle registry q114/q115 use.
"""

from __future__ import annotations

from collections.abc import Iterator
from fractions import Fraction

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _support_fraction(support: float) -> Fraction:
    """The exact rational the caller meant: Fraction of the decimal
    string, so support=0.07 is 7/100, not the binary double near it."""
    if not (0.0 < support <= 1.0):
        raise ValueError(f"support must be in (0, 1], got {support}")
    return Fraction(str(support))


def _misra_gries_candidates(values, k: int) -> list:
    """Classic row-at-a-time Misra-Gries: maintain ≤ k counters;
    decrement all when a new value arrives with the table full.
    Survivors = candidates. Kept as the pure reference implementation
    the no-miss property test checks the vectorized path against."""
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


def _mg_update_weighted(counters: dict, v, w: int, k: int) -> None:
    """Weighted Misra-Gries update: absorb ``w`` occurrences of ``v``
    in O(k) WORST CASE per call, preserving the classic undercount
    bound (each decrement of d removes d·(k+1) total mass).

    Why worst case and not just amortized: the loop body runs at most
    TWICE. When ``v`` is absent and the table is full, the first pass
    decrements every counter by d = min(min_count, w); either w ≤
    min_count (w is fully absorbed as decrements — loop exits with
    w == 0) or w > min_count (every counter holding min_count hits 0
    and is evicted, so the second pass takes the ``len(counters) < k``
    insert branch and returns). Each pass scans the ≤ k counters once,
    so a single call is ≤ 2 scans = O(k)."""
    while w > 0:
        if v in counters:
            counters[v] += w
            return
        if len(counters) < k:
            counters[v] = w
            return
        d = min(min(counters.values()), w)
        dead = []
        for c in counters:
            counters[c] -= d
            if counters[c] == 0:
                dead.append(c)
        for c in dead:
            del counters[c]
        w -= d


def support_capacity(support: float) -> int:
    """k = ⌈1/support⌉ in exact integer arithmetic."""
    frac = _support_fraction(support)
    return -(-frac.denominator // frac.numerator)


def task_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """One weighted Misra-Gries summary per TASK over non-null values
    of ``col``: rows (col=value, __w=MG counter weight, __pn=NULL) for
    each of the ≤ k surviving counters, plus ONE marker row
    (col=NULL, __w=NULL, __pn=partition row count). Input nulls are
    filtered, so a NULL value column unambiguously marks the marker.

    Shared by the batch operator (which ignores __w — phase 2 recounts
    exactly) and the streaming fold (which merges the weighted
    counters; MG summaries are mergeable with the εn bound preserved —
    Berinde et al. PODS'09, Agarwal et al. 'Mergeable Summaries')."""
    out_schema = T.StructType([
        T.StructField(col, df.schema[col].dataType),
        T.StructField("__w", T.LongType()),
        T.StructField("__pn", T.LongType()),
    ])

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_p = 0
        for pdf in batches:
            # vectorized pre-aggregation: the Python loop below runs
            # over DISTINCT values in the batch, not rows
            vc = pdf[col].value_counts(dropna=True)
            n_p += int(vc.sum())
            for v, w in vc.items():
                _mg_update_weighted(counters, v, int(w), k)
        yield pd.DataFrame({col: list(counters) + [None],
                            "__w": list(counters.values()) + [None],
                            "__pn": [None] * len(counters) + [n_p]})

    return (df.select(col).where(F.col(col).isNotNull())
            .mapInPandas(summarize, schema=out_schema))


def heavy_hitters(df: DataFrame, col: str, support: float) -> DataFrame:
    """Exact frequent items: every value of ``col`` occurring in at
    least ``support`` (0 < support ≤ 1, read as the exact decimal
    written — see module doc on threshold exactness) of the rows, with
    its exact count — computed with candidate-bounded state in two
    data scans (see module doc). Null values — and NaN floats, which
    behave as nulls here — are ignored (SQL COUNT semantics: a null is
    not a value). Returns (col, count) rows; ties and order are exact,
    so the result is engine-independent."""
    frac = _support_fraction(support)
    k = support_capacity(support)
    summary = (task_summaries(df, col, k)
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
    # count >= ceil(num/den * n)  ⟺  count*den >= num*n  (count integer)
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col("count") * F.lit(frac.denominator)
               >= F.lit(frac.numerator) * F.col("__n"))
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
    Each Arrow batch is pre-aggregated with a vectorized
    ``value_counts`` over (group, value), so the Python loop runs over
    distinct pairs per batch, not rows. The exact recount joins
    candidates on (group, value), keeping the aggregation
    candidate-sized; the threshold compares against each group's own
    total in exact integer arithmetic (see module doc). Output:
    group_cols + (col, count), engine-independent. Rows with null group
    keys are excluded (join equality semantics, matching the SQL
    oracle's GROUP BY/JOIN).

    **Skew note (100 TB).** The recount's ``groupBy(group_cols, col)``
    keys on the PAIR, so a whale source spreads across its many token
    values; but the phase-2 totals join shuffles on ``group_cols``
    alone, and a whale group (one source = 90% of rows) concentrates
    its candidate-count rows on one reducer. The candidate side is
    bounded (≤ k·tasks rows per group), so the hot partition is
    summary-sized, not data-sized — AQE's skew-join split handles the
    residual imbalance. If a diagnosis (registry q105 / the
    q105→q50 decision rule) shows the totals join dominated by one
    group, ``analytics.salted_join`` applies: totals are one row per
    group, i.e. the thin-dim scenario the salted join targets."""
    frac = _support_fraction(support)
    k = -(-frac.denominator // frac.numerator)
    fields = [T.StructField(g, df.schema[g].dataType) for g in group_cols]
    fields.append(T.StructField(col, df.schema[col].dataType))
    fields.append(T.StructField("__pn", T.LongType()))
    out_schema = T.StructType(fields)

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summaries: dict = {}   # group key tuple -> MG counters
        group_n: dict = {}     # group key tuple -> partition row count
        for pdf in batches:
            sub = pdf[[*group_cols, col]].dropna(subset=[col])
            if sub.empty:
                continue
            # vectorized: one C-level count over (group..., value);
            # the loop below is over DISTINCT pairs in the batch
            vc = sub.value_counts(dropna=False)
            for key, w in vc.items():
                gk, v = key[:-1], key[-1]
                group_n[gk] = group_n.get(gk, 0) + int(w)
                _mg_update_weighted(summaries.setdefault(gk, {}), v,
                                    int(w), k)
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
        .where(F.col("count") * F.lit(frac.denominator)
               >= F.lit(frac.numerator) * F.col("__n"))
        .select(*group_cols, col, "count")
    )
