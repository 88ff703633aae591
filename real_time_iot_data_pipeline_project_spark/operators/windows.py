"""Window / ordered computation (SURVEY.md §2.6 W1-W6, §2.7).

The reference relies on append order (``iloc[-1]`` = latest,
``Solar_Generation.py:255``); we never assume physical order — every
ordered op declares an explicit ``orderBy`` with a deterministic
tie-breaker.

Scale notes: all ops here are one shuffle on the partition key. The
latest-per-key pattern uses ``max_by``-style aggregation when only the
latest row is needed (partial-aggregatable — far cheaper than a full
window sort at 100 TB); the window variant is kept for when the full
ordered frame is required downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, key: str, order_col: str,
                   tiebreak_col: str | None = None) -> DataFrame:
    """W1 — most recent row per key (api_df.iloc[-1] per station,
    Solar_Generation.py:255). Window + row_number: deterministic via
    tie-breaker, keeps the full row."""
    order = [F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def rank_by(df: DataFrame, order_col: str, *, partition_by: str | None = None,
            ascending: bool = False, rank_fn: str = "rank") -> DataFrame:
    """W2 — ranking (leaderboard sort, Solar_Dashboard.py:482) with an
    explicit rank column; `rank`/`dense_rank`/`row_number`."""
    fns = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number}
    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = (Window.partitionBy(partition_by) if partition_by else Window.partitionBy()).orderBy(order)
    return df.withColumn(f"{rank_fn}", fns[rank_fn]().over(w))


def top_k(df: DataFrame, order_col: str, k: int,
          tiebreak_col: str | None = None, ascending: bool = False) -> DataFrame:
    """L1+L2 — deterministic global top-k. Spark executes orderBy+limit
    as TakeOrderedAndProject (per-partition heap + driver merge of k) —
    no global sort even at 100 TB."""
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    return df.orderBy(*order).limit(k)


def delta_vs_previous(df: DataFrame, key: str, order_col: str, value_col: str,
                      tiebreak_col: str | None = None) -> DataFrame:
    """W6 — current − previous per key (st.metric delta,
    Solar_Generation.py:275-276), via lag."""
    order = [F.col(order_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(value_col).over(w)
    return df.withColumn("prev_value", prev).withColumn(
        "delta", F.col(value_col) - prev
    )


def retain_last_interval(df: DataFrame, ts_col: str, hours: float = 6.0,
                         now_expr: F.Column | None = None) -> DataFrame:
    """P6/W4 — time-based retention (keep last N hours,
    Wind_Genration.py:281-283). ``now_expr`` defaults to
    current_timestamp(); pass max(ts) for reproducible batch tests."""
    now = now_expr if now_expr is not None else F.current_timestamp()
    return df.filter(
        F.col(ts_col) >= now - F.expr(f"INTERVAL {int(hours * 3600)} SECONDS")
    )


def retain_last_n_per_key(df: DataFrame, key: str, order_col: str, n: int = 100,
                          tiebreak_col: str | None = None) -> DataFrame:
    """W5 — count-based ring-buffer retention (last 100 points per station,
    Wind_Genration.py:321-322). Batch analogue of the streaming
    time-based watermark substitute (SURVEY.md §4.2-5)."""
    order = [F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def tumbling_window_agg(df: DataFrame, ts_col: str, duration: str,
                        group_cols: list[str], aggs: list[F.Column]) -> DataFrame:
    """T4 — tumbling event-time window aggregation (energy per 10-min /
    hour rollups)."""
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def asof_join(left: DataFrame, right: DataFrame, on: str, by: list[str],
              value_cols: list[str],
              tolerance_seconds: float | None = None,
              direction: str = "backward") -> DataFrame:
    """As-of join: attach to every left row the ``value_cols`` of the
    right row with the same ``by`` keys whose ``on`` is, per
    ``direction`` (pandas ``merge_asof`` semantics, all inclusive):

    - ``backward`` — latest right.on <= left.on (DuckDB ``ASOF JOIN``);
    - ``forward``  — earliest right.on >= left.on;
    - ``nearest``  — smaller |right.on − left.on|; exact ties resolve
      BACKWARD (the earlier right row — documented, deterministic).

    No match -> nulls. Left rows and columns are preserved; matched
    values arrive as ``asof_<col>`` plus ``asof_ts`` (the matched right
    timestamp). ``tolerance_seconds`` nulls matches farther than the
    tolerance in the match direction (either direction for nearest).

    Determinism contract: the right side must be unique per (by, on) —
    duplicate right timestamps make every as-of definition ambiguous
    (reduce first, e.g. max per key+ts). Enforced lazily by the caller;
    this function documents rather than re-aggregates so the reduction
    rule stays visible at the call site.

    Scale shape — the reason this is NOT a range join: both sides union
    into one relation tagged by side, then ONE window partitioned by
    ``by`` carries the last non-null right value through the traversal
    (``last(..., ignorenulls=True)`` over rows-unbounded-preceding;
    ascending traversal for backward, descending for forward, both for
    nearest). One shuffle on the by-keys — Spark reuses the exchange
    for the second window in the nearest case — no per-row range probe,
    no broadcast of either side, no O(left x right) candidate stage.
    Right rows traverse before left rows at equal timestamps (side 0 <
    1), which is exactly what makes the join inclusive.

    Reserved names: the implementation owns the ``__``-prefixed scratch
    columns (``__side``, ``__rts``, ``__rv_*``, ``__b_*``, ``__f_*``)
    and the ``asof_*`` output prefix. Left columns carrying those
    prefixes, or a value_col literally named ``ts`` (it would collide
    with the matched-timestamp output ``asof_ts``), raise ValueError
    instead of being silently clobbered."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if "ts" in value_cols:
        raise ValueError(
            "value_cols may not contain 'ts': the matched right timestamp "
            "is always emitted as asof_ts — alias the right value column "
            "before the join")
    reserved = [c for c in left.columns
                if c.startswith("__") or c.startswith("asof_")]
    if reserved:
        raise ValueError(
            f"left columns {reserved} collide with asof_join's reserved "
            "'__'/'asof_' prefixes — rename them before the join")
    lcols = left.columns
    l_tagged = left.withColumn("__side", F.lit(1))
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"__rv_{c}", F.lit(None).cast(
            dict(right.dtypes)[c]))
    l_tagged = l_tagged.withColumn("__rts", F.lit(None).cast(dict(right.dtypes)[on]))

    r_tagged = right.select(
        *by, F.col(on),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes
          if c not in by and c != on],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
        F.col(on).alias("__rts"),
    ).select(*lcols, "__side", *[f"__rv_{c}" for c in value_cols], "__rts")

    unioned = l_tagged.select(*r_tagged.columns).unionByName(r_tagged)

    def carry(df: DataFrame, prefix: str, descending: bool) -> DataFrame:
        order = F.col(on).desc() if descending else F.col(on).asc()
        w = (Window.partitionBy(*by).orderBy(order, F.col("__side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        cols = [F.last(f"__rv_{c}", ignorenulls=True).over(w)
                .alias(f"{prefix}{c}") for c in value_cols]
        cols.append(F.last("__rts", ignorenulls=True).over(w)
                    .alias(f"{prefix}ts"))
        return df.select("*", *cols)

    def apply_tolerance(df: DataFrame, prefix: str) -> DataFrame:
        if tolerance_seconds is None:
            return df
        gap = F.abs(F.unix_micros(F.col(on)) - F.unix_micros(f"{prefix}ts"))
        stale = gap > int(tolerance_seconds * 1_000_000)
        for c in [*[f"{prefix}{c}" for c in value_cols], f"{prefix}ts"]:
            df = df.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        return df

    if direction in ("backward", "forward"):
        carried = carry(unioned, "asof_", direction == "forward")
        out = apply_tolerance(carried.filter(F.col("__side") == 1), "asof_")
        return out.select(*lcols, *[f"asof_{c}" for c in value_cols], "asof_ts")

    # nearest: both traversals over the SAME partitioning, pick per row
    carried = carry(carry(unioned, "__b_", False), "__f_", True)
    out = apply_tolerance(apply_tolerance(
        carried.filter(F.col("__side") == 1), "__b_"), "__f_")
    t = F.unix_micros(F.col(on))
    bgap = t - F.unix_micros("__b_ts")
    fgap = F.unix_micros("__f_ts") - t
    use_b = (F.col("__f_ts").isNull()
             | (F.col("__b_ts").isNotNull() & (bgap <= fgap)))
    pick = [
        F.when(use_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
        .alias(f"asof_{c}")
        for c in [*value_cols, "ts"]
    ]
    return out.select(*lcols, *pick)


def range_join(points: DataFrame, intervals: DataFrame, point_ts: str,
               start_col: str, end_col: str, by: list[str],
               bin_seconds: int) -> DataFrame:
    """Interval containment join at scale: pair every point row with
    every interval row (same ``by`` keys) whose
    [start_col, end_col] contains point_ts — WITHOUT the
    BroadcastNestedLoopJoin/CartesianProduct a naive inequality join
    plans (O(points x intervals): the canonical 100 TB scale trap).

    Shape: time is bucketed into fixed ``bin_seconds`` bins; each
    interval explodes into the bins it overlaps (bounded fan-out:
    ceil(len/bin)+1 rows per interval), each point lands in exactly ONE
    bin, and the join becomes a hash equi-join on (by..., bin) with the
    containment predicate verified per candidate. A point meets an
    interval in at most one bin (its own), so no dedup stage is needed.
    Pick bin_seconds close to the typical interval length: shorter bins
    inflate the interval explode, longer bins inflate per-bin candidate
    verification.

    Column contract: the join is on bare names, so apart from the ``by``
    keys the two inputs must have DISJOINT column names (and neither may
    already contain ``__bin``); otherwise the containment filter would be
    ambiguous. Violations raise ValueError — alias/rename before calling
    (as q82 does with win_start/win_end)."""
    overlap = (set(points.columns) & set(intervals.columns)) - set(by)
    if overlap:
        raise ValueError(
            f"points and intervals share non-key columns {sorted(overlap)}; "
            "range_join joins on bare names — rename one side first")
    if "__bin" in points.columns or "__bin" in intervals.columns:
        raise ValueError("'__bin' is reserved by range_join")
    bin_us = bin_seconds * 1_000_000
    p = points.withColumn(
        "__bin", F.floor(F.unix_micros(F.col(point_ts)) / F.lit(bin_us)))
    iv = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(
            F.floor(F.unix_micros(F.col(start_col)) / F.lit(bin_us)),
            F.floor(F.unix_micros(F.col(end_col)) / F.lit(bin_us)),
        )),
    )
    out = (
        p.join(iv, [*by, "__bin"])
        .filter((F.col(point_ts) >= F.col(start_col))
                & (F.col(point_ts) <= F.col(end_col)))
    )
    return out.drop("__bin")


def time_weighted_avg(df: DataFrame, ts_col: str, key: str, value_col: str,
                      tiebreak_col: str | None = None) -> DataFrame:
    """Time-weighted mean of ``value_col`` per key: each sample is
    weighted by its holding time (next sample's timestamp minus its
    own — a step-function integral divided by the observed span), the
    correct average for irregularly-sampled sensors where the
    arithmetic mean over-weights chatty periods. The final sample of
    each key holds no interval and carries zero weight.

    Returns (key, twa, span_seconds, n_samples). Keys with a single
    sample (no spanned time) yield null twa AND null span_seconds (the
    sum over zero lead-intervals is null, not zero — callers gating on
    span must coalesce).

    Value domain: values are quantized to 1e-6 absolute precision (they
    are scaled to integers for order-independent, cross-engine-exact
    summation) and must satisfy |value| < ~1e13 (the DECIMAL(19,0)
    scaled range). Micro-scale readings (|value| ≲ 1e-5) should be
    rescaled to larger units before calling — at 1e-6 quantization they
    would collapse toward zero.

    Determinism: equal timestamps make the lead() pairing ambiguous —
    pass ``tiebreak_col`` (any unique column, ordered identically in
    the oracle) to pin it; zero-width intervals contribute zero weight
    either way, but WHICH value bridges into the next interval depends
    on the order. Weights/products run through DECIMAL so the grouped
    sum is order-independent (registry rule 1).

    Scale shape: one shuffle on the key (the lead window), then a
    partial-aggregatable groupBy on the same key — Spark reuses the
    exchange, so the whole op is a single exchange + two narrow
    passes."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key).orderBy(*order)
    dt_us = (F.unix_micros(F.lead(ts_col).over(w))
             - F.unix_micros(F.col(ts_col)))
    # Cross-engine exactness: double→decimal CASTS round differently
    # across engines at the last ulp, so the value is scaled to an
    # integer with round() (identical half-away-from-zero semantics on
    # the identical IEEE product in Spark and DuckDB), and all sums are
    # integer-decimal (width 19 → int128 storage, no overflow). The
    # final division is pure double ÷ double of identical operands.
    v_scaled = F.round(F.col(value_col) * F.lit(1_000_000)).cast("decimal(19,0)")
    weighted = df.select(
        F.col(key),
        dt_us.alias("__dt"),
        (v_scaled * dt_us.cast("decimal(19,0)")).alias("__vdt"),
    )
    sum_dt = F.sum(F.col("__dt").cast("decimal(19,0)"))
    twa = F.when(
        F.coalesce(sum_dt, F.lit(0).cast("decimal(19,0)")) == 0,
        F.lit(None).cast("double"),
    ).otherwise(F.sum("__vdt").cast("double") / sum_dt.cast("double")
                / F.lit(1_000_000.0))
    return (
        weighted.groupBy(key)
        .agg(
            twa.alias("twa"),
            (F.sum("__dt") / F.lit(1_000_000)).cast("double")
            .alias("span_seconds"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


def detect_gaps(df: DataFrame, ts_col: str, key: str,
                min_gap_seconds: float,
                tiebreak_col: str | None = None) -> DataFrame:
    """Sensor-health gap report: every interval between consecutive
    samples of a key longer than ``min_gap_seconds`` — the outage/
    dropout detector behind the reference's stream-monitoring panel
    (S13; the dashboards eyeball this on the last-N chart, this op
    states it). Returns (key, gap_start, gap_end, gap_seconds), one row
    per detected gap.

    Strictly-greater comparison, microsecond-exact: a gap of exactly
    ``min_gap_seconds`` is NOT reported (sampling at the nominal period
    is healthy, not a dropout). One shuffle on the key; the filter runs
    scan-side after the single lead() window."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    gap_us = F.unix_micros(nxt) - F.unix_micros(F.col(ts_col))
    return (
        df.select(
            F.col(key),
            F.col(ts_col).alias("gap_start"),
            nxt.alias("gap_end"),
            (gap_us / F.lit(1_000_000.0)).alias("gap_seconds"),
        )
        .filter(F.col("gap_seconds") > F.lit(min_gap_seconds))
    )


def ohlc_downsample(df: DataFrame, ts_col: str, key: str, value_col: str,
                    bucket_seconds: int,
                    tiebreak_col: str) -> DataFrame:
    """Telemetry compaction to fixed time bars: per key and
    ``bucket_seconds`` bucket, emit (open, high, low, close, n_samples)
    — the lossy-but-shaped downsample every long-horizon sensor
    dashboard reads instead of raw points (and the classic OHLC bar of
    market data). 1000× fewer rows downstream while preserving range
    and endpoints per bucket.

    open/close are the values at the first/last (ts, tiebreak) in the
    bucket — ``min_by``/``max_by`` over a struct ordering key, so the
    whole op is ONE partial-aggregatable groupBy (single shuffle, no
    window sort). ``tiebreak_col`` is required, not optional: without a
    unique ordering, open/close are nondeterministic under duplicate
    timestamps (the same reason the as-of tier demands a reduced right
    side)."""
    bucket_us = bucket_seconds * 1_000_000
    bucket = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(bucket_us))
    okey = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (
        df.groupBy(F.col(key), bucket.alias("__bucket"))
        .agg(
            F.min_by(F.col(value_col), okey).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(F.col(value_col), okey).alias("close"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            F.col(key),
            F.timestamp_micros(F.col("__bucket") * F.lit(bucket_us))
            .alias("bar_start"),
            "open", "high", "low", "close", "n_samples",
        )
    )


def grid_spine(df: DataFrame, key: str, ts_col: str,
               step_seconds: int) -> DataFrame:
    """Per-key regular time grid: points every ``step_seconds`` (aligned
    to epoch multiples of the step) from the first aligned point
    at-or-after each key's earliest sample to the last at-or-before its
    latest. Map-side except the per-key bounds aggregate; the shared
    spine under resample_ffill and the feature-matrix query (q92) — one
    definition so alignment/empty-range fixes reach every consumer.
    Returns (key, grid_ts); keys whose span contains no aligned point
    produce no rows."""
    step_us = step_seconds * 1_000_000
    bounds = (
        df.groupBy(key)
        .agg(F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi"))
        .select(
            F.col(key),
            (F.ceil(F.unix_micros("__lo") / F.lit(step_us)) * step_us)
            .alias("__start"),
            (F.floor(F.unix_micros("__hi") / F.lit(step_us)) * step_us)
            .alias("__stop"),
        )
        .filter(F.col("__start") <= F.col("__stop"))
    )
    return bounds.select(
        F.col(key),
        F.explode(
            F.sequence("__start", "__stop", F.lit(step_us))
        ).alias("__grid_us"),
    ).select(F.col(key), F.timestamp_micros("__grid_us").alias("grid_ts"))


def resample_ffill(df: DataFrame, ts_col: str, key: str, value_col: str,
                   step_seconds: int) -> DataFrame:
    """Resample an irregular series onto a regular per-key grid with
    forward-fill: grid points every ``step_seconds`` (aligned to epoch
    multiples of the step) from the first aligned point at-or-after each
    key's earliest sample to its latest sample; each point carries the
    most recent value at-or-before it. The join-ready shape ML feature
    matrices and cross-sensor alignment need — built by COMPOSING the
    engine's own primitives: a sequence-exploded spine (map-side, no
    shuffle) into the single-window as-of join.

    Duplicate timestamps on the input reduce to max(value) first (the
    as-of determinism contract, same reduction as q81). Returns
    (key, grid_ts, value, value_ts) where value_ts is the sampled ts —
    never null by construction: the grid starts at-or-after each key's
    earliest sample, so every grid point has a carry source."""
    grid = grid_spine(df, key, ts_col, step_seconds)
    # both sides rename their time column to the literal "ts" the
    # as-of call below joins on — without the right-side rename any
    # ts_col other than "ts" would KeyError inside asof_join
    reduced = (
        df.groupBy(key, ts_col)
        .agg(F.max(value_col).alias("value"))
        .withColumnRenamed(ts_col, "ts")
    )
    out = asof_join(grid.withColumnRenamed("grid_ts", "ts"), reduced,
                    on="ts", by=[key], value_cols=["value"])
    return out.select(
        F.col(key), F.col("ts").alias("grid_ts"),
        F.col("asof_value").alias("value"),
        F.col("asof_ts").alias("value_ts"),
    )


def rolling_zscore(df: DataFrame, ts_col: str, key: str, value_col: str,
                   window_seconds: int, k: float = 3.0) -> DataFrame:
    """Adaptive anomaly detection per key: each row's deviation from its
    OWN trailing [ts − window, ts] baseline — trailing mean, population
    std, z-score, and an ``is_anomaly`` flag at |z| > k. The adaptive
    upgrade of the reference's static threshold alert (P11,
    Solar_Generation.py alert path): a sensor whose normal level drifts
    seasonally alerts on deviation from its recent self, not on a fixed
    constant.

    Same single-sort/single-Window shape as ``rolling_time_agg`` (one
    shuffle on the key; all frame aggregates in ONE select). Moments
    come from decimal sums of 1e-6-scaled values (order-independent,
    cross-engine exact — same quantization contract as
    ``time_weighted_avg``); mean/var/z are then pure double arithmetic
    on identical operands in any engine. Rows whose frame has zero
    variance (single sample, constant run) yield null z / false flag.
    The current row is INCLUDED in its own baseline (frame = trailing
    window inclusive): at alert-worthy spikes the one-row contamination
    only shrinks |z|, and inclusion keeps the frame identical to
    rolling_time_agg's."""
    w = (Window.partitionBy(key)
         .orderBy(F.unix_micros(F.col(ts_col)))
         .rangeBetween(-window_seconds * 1_000_000, 0))
    v_scaled = F.round(F.col(value_col) * F.lit(1_000_000)).cast("decimal(19,0)")
    sum1 = F.sum(v_scaled).over(w).cast("double")
    sum2 = F.sum(v_scaled * v_scaled).over(w).cast("double")
    cnt = F.count(v_scaled).over(w).cast("double")
    mean = sum1 / cnt / F.lit(1e6)
    var = sum2 / cnt / F.lit(1e12) - mean * mean
    out = df.select(
        "*",
        mean.alias("trailing_mean"),
        var.alias("__var"),
        cnt.cast("long").alias("trailing_n"),
    )
    std = F.when(F.col("__var") > 0, F.sqrt("__var"))
    z = (F.col(value_col) - F.col("trailing_mean")) / std
    return (
        out.withColumn("trailing_std", F.coalesce(std, F.lit(0.0)))
        .withColumn("zscore", z)
        .withColumn("is_anomaly",
                    F.coalesce(F.abs(z) > F.lit(float(k)), F.lit(False)))
        .drop("__var")
    )


def rolling_time_agg(df: DataFrame, ts_col: str, key: str, value_col: str,
                     window_seconds: int) -> DataFrame:
    """Trailing time-range aggregate per key: for every row, the sum of
    ``value_col`` and the ROW COUNT (COUNT(*) semantics — every frame row
    counts, including rows whose value_col is null, while trailing_sum
    skips nulls) over [ts - window, ts] for the same key — a RANGE window
    frame over event time (true time semantics: rows with equal
    timestamps all see each other, gaps shrink the frame), not a
    row-count frame.

    One shuffle on the key; the frame is evaluated in a single ordered
    pass per partition — both aggregates are emitted from ONE select so
    Catalyst plans a single Window node over a single Sort (chained
    withColumn calls alias the ordering expression separately and plan
    two full sort passes). Sums run through DECIMAL(18,4) so the result
    is order-independent and cross-engine exact (registry rule 1)."""
    w = (Window.partitionBy(key)
         .orderBy(F.unix_micros(F.col(ts_col)))
         .rangeBetween(-window_seconds * 1_000_000, 0))
    return df.select(
        "*",
        F.sum(F.col(value_col).cast("decimal(18,4)")).over(w)
        .cast("double").alias("trailing_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_cnt"),
    )
