"""Guard-rail tests for the streaming CDC upsert sink (the cases the
five e2e tests in test_streaming.py don't cover)."""

from __future__ import annotations

import datetime as dt

import pytest

from real_time_iot_data_pipeline_project_spark.streaming import upsert


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "k long, ts timestamp, seq long, v string, op string")


def _t(s):
    return dt.datetime(2024, 5, 1, 0, 0, s)


def test_empty_batch_is_a_noop(spark, tmp_path):
    snap = str(tmp_path / "snap")
    upsert.apply_cdc_batch(
        spark, _rows(spark, [(1, _t(0), 1, "a", "U")]), snap,
        key_cols=["k"], order_cols=["ts", "seq"], op_col="op", n_buckets=4)
    before = {tuple(r) for r in spark.read.parquet(snap).collect()}
    upsert.apply_cdc_batch(
        spark, _rows(spark, []), snap,
        key_cols=["k"], order_cols=["ts", "seq"], op_col="op", n_buckets=4)
    after = {tuple(r) for r in spark.read.parquet(snap).collect()}
    assert after == before


def test_bucket_count_change_refuses(spark, tmp_path):
    """Shrinking n_buckets on an existing snapshot re-routes keys away
    from rows stored under the old hashing (stale survivors, deletes
    that stop protecting) — the sink must refuse, not silently
    corrupt."""
    snap = str(tmp_path / "snap")
    # seed enough keys to populate high bucket ids
    seed = [(k, _t(0), k, f"v{k}", "U") for k in range(1, 60)]
    upsert.apply_cdc_batch(
        spark, _rows(spark, seed), snap,
        key_cols=["k"], order_cols=["ts", "seq"], op_col="op", n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets"):
        upsert.apply_cdc_batch(
            spark, _rows(spark, [(1, _t(1), 100, "x", "U")]), snap,
            key_cols=["k"], order_cols=["ts", "seq"], op_col="op",
            n_buckets=4)
