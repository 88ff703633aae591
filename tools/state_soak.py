"""Soak test for the stateful streaming tier's O(1)-state claims
(VERDICT r6 item 6): drive 50+ micro-batches at FIXED key cardinality
and show that state size plateaus while per-batch cost stays flat.

Two subjects:

1. ``adaptive_alert_stream`` — claims three numbers (mean, var, n) of
   state per key. Measured via the query's own progress metrics
   (``stateOperators[0].numRowsTotal`` / ``stateMemoryUsedBytes``)
   across 60 micro-batches over a fixed 50-key population: rows must
   pin at exactly 50 from the first full batch onward, memory must
   plateau, batch wall time must not trend up.

2. CDC upsert sink (``streaming.upsert.apply_cdc_batch``) — claims
   per-trigger cost O(batch + touched buckets), never O(total state).
   60 batches of upserts+deletes over a fixed 200-key population,
   n_buckets=8: snapshot bytes/files and batch wall time must plateau
   (tombstones are retained but bounded by the key population — state
   is one row per key, whatever op last touched it).

Prints RESULT lines; the summary asserts the plateaus numerically.

Usage: python tools/state_soak.py [n_batches]   (default 60)
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from real_time_iot_data_pipeline_project_spark.session import get_spark  # noqa: E402
from real_time_iot_data_pipeline_project_spark.streaming import (  # noqa: E402
    job, stateful, upsert,
)

N_KEYS_ALERT = 50
N_KEYS_CDC = 200
N_BUCKETS = 8


def dir_stats(path: str) -> tuple[int, int]:
    total, files = 0, 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            files += 1
            total += os.path.getsize(os.path.join(root, n))
    return total, files


def soak_alert_stream(spark, workdir: str, n_batches: int) -> None:
    src = os.path.join(workdir, "alert_src")
    os.makedirs(src)
    ckpt = os.path.join(workdir, "alert_ckpt")
    sink = os.path.join(workdir, "alert_sink")
    schema = T.StructType([
        T.StructField("station_id", T.StringType()),
        T.StructField("ts_s", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])

    raw = spark.readStream.schema(
        T.StructType([T.StructField("value", T.StringType())])).text(src)
    parsed = (job.parse_json_stream(raw, schema)
              .withColumn("ts", F.to_timestamp("ts_s")))
    alerts = stateful.adaptive_alert_stream(
        parsed, "station_id", "ts", "value", alpha=0.2, k=3.0, min_obs=5)
    q = (alerts.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt)
         .outputMode("append").start())

    rows_hist, mem_hist, t_hist = [], [], []
    try:
        for b in range(n_batches):
            base = dt.datetime(2025, 1, 1) + dt.timedelta(minutes=b)
            rows = [(f"S{i:03d}", (base + dt.timedelta(seconds=i)).strftime(
                "%Y-%m-%d %H:%M:%S"), 10.0 + (b * 7 + i) % 5)
                for i in range(N_KEYS_ALERT)]
            (spark.createDataFrame(rows, ["station_id", "ts_s", "value"])
             .select(F.to_json(F.struct("station_id", "ts_s", "value"))
                     .alias("value"))
             .coalesce(1).write.mode("append").text(src))
            t0 = time.monotonic()
            q.processAllAvailable()
            t_hist.append(time.monotonic() - t0)
            prog = q.lastProgress
            ops = prog.get("stateOperators") or []
            if ops:
                rows_hist.append(ops[0].get("numRowsTotal"))
                mem_hist.append(ops[0].get("stateMemoryUsedBytes") or
                                ops[0].get("memoryUsedBytes") or 0)
    finally:
        q.stop()

    half = len(rows_hist) // 2
    print(f"RESULT alert-stream batches={len(t_hist)} keys={N_KEYS_ALERT}",
          flush=True)
    print(f"RESULT   state rows: first={rows_hist[0]} last={rows_hist[-1]} "
          f"max={max(rows_hist)}", flush=True)
    print(f"RESULT   state memory bytes: "
          f"batch1={mem_hist[0]} mid={mem_hist[half]} last={mem_hist[-1]}",
          flush=True)
    print(f"RESULT   batch wall s: first10={sum(t_hist[:10]) / 10:.2f} "
          f"last10={sum(t_hist[-10:]) / 10:.2f}", flush=True)
    assert max(rows_hist) == N_KEYS_ALERT, rows_hist  # one row per key, ever
    assert mem_hist[-1] <= mem_hist[half] * 1.5, (mem_hist[half], mem_hist[-1])
    assert sum(t_hist[-10:]) <= sum(t_hist[:10]) * 1.5, "batch time trending up"
    print("RESULT   alert-stream plateau: PASS", flush=True)


def soak_cdc_upsert(spark, workdir: str, n_batches: int) -> None:
    snap = os.path.join(workdir, "cdc_snap")
    size_hist, file_hist, t_hist = [], [], []
    for b in range(n_batches):
        base = dt.datetime(2025, 1, 1) + dt.timedelta(minutes=b)
        rows = []
        for i in range(N_KEYS_CDC):
            op = "D" if (b + i) % 17 == 0 else "U"
            rows.append((i, base + dt.timedelta(seconds=i), b * N_KEYS_CDC + i,
                         f"v{b}_{i}", op))
        batch = spark.createDataFrame(
            rows, "k long, ts timestamp, seq long, v string, op string")
        t0 = time.monotonic()
        upsert.apply_cdc_batch(spark, batch, snap, key_cols=["k"],
                               order_cols=["ts", "seq"], op_col="op",
                               n_buckets=N_BUCKETS)
        t_hist.append(time.monotonic() - t0)
        size, files = dir_stats(snap)
        size_hist.append(size)
        file_hist.append(files)

    n_rows = spark.read.parquet(snap).count()
    half = n_batches // 2
    print(f"RESULT cdc-upsert batches={n_batches} keys={N_KEYS_CDC} "
          f"buckets={N_BUCKETS}", flush=True)
    print(f"RESULT   snapshot rows={n_rows} (== key population; deletes "
          "retained as tombstone rows)", flush=True)
    print(f"RESULT   snapshot bytes: batch1={size_hist[0]} "
          f"mid={size_hist[half]} last={size_hist[-1]}", flush=True)
    print(f"RESULT   snapshot files: batch1={file_hist[0]} "
          f"mid={file_hist[half]} last={file_hist[-1]}", flush=True)
    print(f"RESULT   batch wall s: first10={sum(t_hist[:10]) / 10:.2f} "
          f"last10={sum(t_hist[-10:]) / 10:.2f}", flush=True)
    assert n_rows == N_KEYS_CDC, n_rows
    assert size_hist[-1] <= size_hist[half] * 1.2, "snapshot bytes growing"
    assert file_hist[-1] <= file_hist[half] * 1.2, "snapshot files growing"
    assert sum(t_hist[-10:]) <= sum(t_hist[:10]) * 1.5, "batch time trending up"
    print("RESULT   cdc-upsert plateau: PASS", flush=True)


def soak_scd2_sink(spark, workdir: str, n_batches: int) -> None:
    """The SCD2 sink's state GROWS only with genuine attribute changes
    (each opens one more interval row), never with observation volume:
    feed 60 batches over a fixed key population where only 1-in-10
    observations change the attribute; dimension rows must track
    (keys + changes), bytes must grow sub-linearly in batches, and the
    per-batch cost must stay flat."""
    from real_time_iot_data_pipeline_project_spark.streaming import scd2

    n_keys = 100
    dim_dir = os.path.join(workdir, "scd2_dim")
    rows_hist, size_hist, t_hist = [], [], []
    for b in range(n_batches):
        base = dt.datetime(2025, 1, 1) + dt.timedelta(minutes=b)
        rows = []
        for i in range(n_keys):
            # attribute changes only when (b + i) crosses a decade —
            # ~10% of observations open a new interval
            attr = f"s{(b + i) // 10 % 4}"
            rows.append((i, base + dt.timedelta(seconds=i),
                         b * n_keys + i, attr))
        batch = spark.createDataFrame(
            rows, "k long, ts timestamp, tb long, a string")
        t0 = time.monotonic()
        scd2.apply_scd2_batch(spark, batch, dim_dir, key_cols=["k"],
                              ts_col="ts", attr_col="a",
                              tiebreak_col="tb", n_buckets=8)
        t_hist.append(time.monotonic() - t0)
        size, _files = dir_stats(dim_dir)
        size_hist.append(size)
        rows_hist.append(spark.read.parquet(dim_dir).count())

    half = n_batches // 2
    changes = rows_hist[-1] - n_keys  # intervals beyond the initial ones
    print(f"RESULT scd2-sink batches={n_batches} keys={n_keys} buckets=8",
          flush=True)
    print(f"RESULT   dim rows: batch1={rows_hist[0]} mid={rows_hist[half]} "
          f"last={rows_hist[-1]} (initial {n_keys} + {changes} changes)",
          flush=True)
    print(f"RESULT   dim bytes: batch1={size_hist[0]} mid={size_hist[half]} "
          f"last={size_hist[-1]}", flush=True)
    print(f"RESULT   batch wall s: first10={sum(t_hist[:10]) / 10:.2f} "
          f"last10={sum(t_hist[-10:]) / 10:.2f}", flush=True)
    # rows track genuine changes (~n_keys * n_batches / 10), never
    # observation volume (n_keys * n_batches)
    assert rows_hist[-1] < n_keys * n_batches / 5, rows_hist[-1]
    assert sum(t_hist[-10:]) <= sum(t_hist[:10]) * 1.5, "batch time trending up"
    print("RESULT   scd2-sink growth-tracks-changes: PASS", flush=True)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    spark = get_spark(app_name="state-soak")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="state_soak_")
    try:
        soak_alert_stream(spark, workdir, n_batches)
        soak_cdc_upsert(spark, workdir, n_batches)
        soak_scd2_sink(spark, workdir, n_batches)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
