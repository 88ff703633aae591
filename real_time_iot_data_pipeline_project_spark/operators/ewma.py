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
