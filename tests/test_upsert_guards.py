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


def test_bucket_count_grow_refuses(spark, tmp_path):
    """GROWING n_buckets is just as corrupting as shrinking (keys rehash
    to different buckets and stop merging against stored rows) but every
    stored dir id stays < the larger count, so dir inspection alone
    cannot catch it — the _n_buckets sidecar must."""
    snap = str(tmp_path / "snap")
    seed = [(k, _t(0), k, f"v{k}", "U") for k in range(1, 60)]
    upsert.apply_cdc_batch(
        spark, _rows(spark, seed), snap,
        key_cols=["k"], order_cols=["ts", "seq"], op_col="op", n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets"):
        upsert.apply_cdc_batch(
            spark, _rows(spark, [(1, _t(1), 100, "x", "U")]), snap,
            key_cols=["k"], order_cols=["ts", "seq"], op_col="op",
            n_buckets=16)


def test_legacy_snapshot_gets_sidecar_backfilled(spark, tmp_path):
    """A pre-sidecar snapshot (no _n_buckets file) still merges under
    the dir-scan fallback, and its next successful batch backfills the
    sidecar so the exact check applies from then on."""
    snap = str(tmp_path / "snap")
    upsert.apply_cdc_batch(
        spark, _rows(spark, [(k, _t(0), k, f"v{k}", "U") for k in range(1, 30)]),
        snap, key_cols=["k"], order_cols=["ts", "seq"], op_col="op",
        n_buckets=8)
    # simulate a legacy snapshot: remove the sidecar
    fs, hpath = upsert._fs_and_path(spark, f"{snap}/{upsert.META_FILE}")
    assert fs.exists(hpath)
    fs.delete(hpath, False)
    upsert.apply_cdc_batch(
        spark, _rows(spark, [(1, _t(1), 100, "x", "U")]), snap,
        key_cols=["k"], order_cols=["ts", "seq"], op_col="op", n_buckets=8)
    assert upsert._read_meta(spark, snap) == 8
    # and the backfilled sidecar now refuses a grow
    with pytest.raises(ValueError, match="n_buckets"):
        upsert.apply_cdc_batch(
            spark, _rows(spark, [(2, _t(2), 101, "y", "U")]), snap,
            key_cols=["k"], order_cols=["ts", "seq"], op_col="op",
            n_buckets=16)


def test_null_op_rows_rejected(spark, tmp_path):
    """A null-op row would occupy state yet vanish from read_snapshot —
    the write path must reject it loudly (ADVICE r6)."""
    snap = str(tmp_path / "snap")
    with pytest.raises(ValueError, match="NULL 'op'"):
        upsert.apply_cdc_batch(
            spark, _rows(spark, [(1, _t(0), 1, "a", None)]), snap,
            key_cols=["k"], order_cols=["ts", "seq"], op_col="op",
            n_buckets=4)


def test_missing_op_column_rejected(spark, tmp_path):
    snap = str(tmp_path / "snap")
    df = spark.createDataFrame([(1, _t(0), 1, "a")],
                               "k long, ts timestamp, seq long, v string")
    with pytest.raises(ValueError, match="no op column"):
        upsert.apply_cdc_batch(
            spark, df, snap, key_cols=["k"], order_cols=["ts", "seq"],
            op_col="op", n_buckets=4)


def test_read_snapshot_surfaces_null_op_legacy_rows(spark, tmp_path):
    """Null-op rows in a hand-written / pre-validation snapshot must
    surface from read_snapshot rather than silently disappear
    (eqNullSafe, ADVICE r6)."""
    snap = str(tmp_path / "snap")
    df = upsert._with_bucket(
        _rows(spark, [(1, _t(0), 1, "a", "U"), (2, _t(0), 2, "b", None),
                      (3, _t(0), 3, "c", "D")]),
        ["k"], 4)
    df.write.partitionBy(upsert.BUCKET_COL).parquet(snap)
    got = {r["k"]: r["op"]
           for r in upsert.read_snapshot(spark, snap, "op").collect()}
    assert got == {1: "U", 2: None}  # tombstone dropped, null-op visible
