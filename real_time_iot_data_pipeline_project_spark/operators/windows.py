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
