"""EWMA smoothing — the reference's one truly stateful/ordered operator
(SURVEY.md W3/T5: ``producer_wind.py:218-228``, alpha=0.35:
``smoothed = α·new + (1−α)·prev`` per station, seeded with the first
observation).

EWMA is inherently sequential per key, so it cannot be a plain window
function. Two implementations:

- ``ewma`` (batch): grouped ``applyInPandas`` — Arrow-batched, one
  sequential scan per key, keys processed in parallel across executors.
  At 100 TB this is shuffle-on-key + O(rows/key) per task; safe as long
  as a single key's history fits a task (true here: per-station series).
- ``ewma_streaming``: ``applyInPandasWithState`` carrying the last
  smoothed value across micro-batches (see streaming.jobs).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_ALPHA = 0.35  # producer_wind.py:224


def ewma(df: DataFrame, key: str, order_col: str, value_col: str,
         alpha: float = DEFAULT_ALPHA, out_col: str = "smoothed") -> DataFrame:
    """Batch EWMA per key ordered by ``order_col``.

    Matches pandas ``Series.ewm(alpha=α, adjust=False).mean()`` — i.e. the
    recursive form the reference producer applies tick-by-tick.
    """
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType())]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return df.groupBy(key).applyInPandas(smooth, schema=out_schema)


def ewma_last(df: DataFrame, key: str, order_col: str, value_col: str,
              tiebreak_col: str | None = None,
              alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """Per-key EWMA reduced to its final value: (key, n_events,
    last_smoothed) — the dashboard's 'current smoothed reading'.

    Unlike the running series (inherently sequential → ``ewma``), the
    *final* value has a closed form: a weighted sum with weights
    ``(1−α)^(n−i)·(α if i>1 else 1)``. That is expressible as window
    functions + one grouped sum — pure codegen'd Column arithmetic, no
    Python workers, fully parallel. ``(1−α)^k`` underflows to 0 for deep
    history, which is exactly the semantics of exponential forgetting.
    """
    from pyspark.sql import Window

    order = [F.col(order_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key).orderBy(*order)
    wp = Window.partitionBy(key)
    slim = df.select(key, order_col, value_col, *([tiebreak_col] if tiebreak_col else []))
    weighted = (
        slim.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wp))
        .withColumn(
            "__w",
            F.pow(F.lit(1.0 - alpha), F.col("__n") - F.col("__rn"))
            * F.when(F.col("__rn") == 1, F.lit(1.0)).otherwise(F.lit(alpha)),
        )
    )
    return weighted.groupBy(key).agg(
        F.max("__n").alias("n_events"),
        F.sum(F.col("__w") * F.col(value_col)).alias("last_smoothed"),
    )
