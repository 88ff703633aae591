"""Stateful streaming operators (SURVEY.md W3/T5).

``ewma_stream``: per-key EWMA smoothing across micro-batches via
``applyInPandasWithState`` — state is one float per key (the last
smoothed value), exactly the reference producer's session_state
(``producer_wind.py:218-228``). Bounded state: one row per station.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.ewma import DEFAULT_ALPHA


def ewma_stream(df: DataFrame, key: str, order_col: str, value_col: str,
                alpha: float = DEFAULT_ALPHA, out_col: str = "smoothed") -> DataFrame:
    """Streaming EWMA keyed by ``key``; emits every input row with its
    smoothed value appended. Rows within a micro-batch are folded in
    event-time order; the running value persists in GroupState."""
    out_schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField(order_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField(out_col, T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("last", T.DoubleType())])

    def update(
        key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col, kind="mergesort")
            smoothed = []
            for v in pdf[value_col]:
                last = v if last is None else alpha * v + (1 - alpha) * last
                smoothed.append(last)
            outs.append(
                pd.DataFrame(
                    {
                        key: pdf[key].astype(str),
                        order_col: pdf[order_col],
                        value_col: pdf[value_col],
                        out_col: smoothed,
                    }
                )
            )
        if last is not None:
            state.update((float(last),))
        yield from outs

    return (
        df.select(key, order_col, value_col)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def adaptive_alert_stream(df: DataFrame, key: str, order_col: str,
                          value_col: str, alpha: float = 0.1,
                          k: float = 3.0,
                          min_obs: int = 5) -> DataFrame:
    """Streaming adaptive anomaly alerts: per-key exponential baseline
    (EWMA mean + EWMA variance — the O(1)-state streaming twin of the
    batch trailing-window z-score, operators.windows.rolling_zscore)
    flagging rows with |value − mean| > k·std. The adaptive upgrade of
    the static threshold alert stream (T6): a drifting sensor alerts on
    deviation from its recent self.

    State per key: (mean, var, n) — three numbers, bounded regardless
    of stream length. Variance uses the exponential analogue of
    Welford's update: diff = x − mean; incr = α·diff;
    mean += incr; var = (1 − α)·(var + diff·incr) — standard EW
    variance, numerically stable, no sum-of-squares cancellation.
    Rows seen before ``min_obs`` observations of their key warm up the
    baseline and never alert (a cold sensor's first readings are not
    anomalies, they ARE the baseline). Fold order inside a micro-batch
    is event-time (mergesort, stable) — same discipline as
    ``ewma_stream``."""
    out_schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField(order_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("baseline_mean", T.DoubleType()),
            T.StructField("baseline_std", T.DoubleType()),
            T.StructField("zscore", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )
    state_schema = T.StructType([
        T.StructField("mean", T.DoubleType()),
        T.StructField("var", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ])

    def update(
        key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.exists:
            mean, var, n = state.get
        else:
            mean, var, n = None, 0.0, 0
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col, kind="mergesort")
            means, stds, zs, flags = [], [], [], []
            for v in pdf[value_col]:
                # a null/NaN reading must not poison the EW baseline
                # (NaN would propagate through mean/var forever and
                # silently disable detection for the key) — emit the
                # row unflagged, leave state untouched, like the batch
                # twin rolling_zscore's null-skipping frame
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    means.append(mean); stds.append(None)
                    zs.append(None); flags.append(False)
                    continue
                if mean is None:
                    mean, var, n = float(v), 0.0, 1
                    means.append(mean); stds.append(0.0)
                    zs.append(None); flags.append(False)
                    continue
                std = math.sqrt(var) if var > 0 else 0.0
                z = (v - mean) / std if std > 0 else None
                warm = n >= min_obs
                means.append(mean); stds.append(std); zs.append(z)
                flags.append(bool(warm and z is not None and abs(z) > k))
                diff = v - mean
                incr = alpha * diff
                mean += incr
                var = (1.0 - alpha) * (var + diff * incr)
                n += 1
            outs.append(pd.DataFrame(
                {
                    key: pdf[key].astype(str),
                    order_col: pdf[order_col],
                    value_col: pdf[value_col],
                    "baseline_mean": means,
                    "baseline_std": stds,
                    "zscore": zs,
                    "is_anomaly": flags,
                }
            ))
        if mean is not None:
            state.update((float(mean), float(var), int(n)))
        yield from outs

    return (
        df.select(key, order_col, value_col)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def ewma_stream_tws(df: DataFrame, key: str, order_col: str, value_col: str,
                    alpha: float = DEFAULT_ALPHA, out_col: str = "smoothed") -> DataFrame:
    """W3/T5 on the Spark 4.x ``transformWithStateInPandas`` API
    (SURVEY §4.2-1) — identical fold semantics to ``ewma_stream``, state
    held in a named ValueState in the RocksDB-backed store (queries must
    run with ``spark.sql.streaming.stateStore.providerClass`` set to
    ``RocksDBStateStoreProvider``; transformWithState requires it, and
    its Python driver worker additionally needs the ``protobuf``
    package). Raises on pre-4.0 runtimes — use ``ewma_stream`` there."""
    out_schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField(order_col, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField(out_col, T.DoubleType()),
        ]
    )
    grouped = df.select(key, order_col, value_col).groupBy(key)
    if not hasattr(grouped, "transformWithStateInPandas"):
        raise RuntimeError(
            "transformWithStateInPandas requires pyspark >= 4.0; "
            "use ewma_stream (applyInPandasWithState) on this runtime"
        )
    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _EwmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last", "last double")

        def handleInputRows(self, key_tuple, rows, timer_values):
            prev = self._last.get()
            last = prev[0] if prev is not None else None
            for pdf in rows:
                pdf = pdf.sort_values(order_col, kind="mergesort")
                smoothed = []
                for v in pdf[value_col]:
                    last = v if last is None else alpha * v + (1 - alpha) * last
                    smoothed.append(last)
                yield pd.DataFrame(
                    {
                        key: pdf[key].astype(str),
                        order_col: pdf[order_col],
                        value_col: pdf[value_col],
                        out_col: smoothed,
                    }
                )
            if last is not None:
                self._last.update((float(last),))

        def close(self) -> None:
            pass

    return grouped.transformWithStateInPandas(
        _EwmaProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )
