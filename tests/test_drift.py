"""Snapshot drift monitor (operators/drift.py): PSI must read ~0 on
identical distributions, flag a planted shift as major, not depend on
partitioning (decimal term sum), and validate its inputs. The
cross-engine value check is registry q122's oracle."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from real_time_iot_data_pipeline_project_spark.operators import drift


def _bins(col):
    return F.when(F.col(col) < 10, "lo").when(F.col(col) < 20, "mid") \
        .otherwise("hi")


def test_identical_snapshots_read_stable(spark):
    df = spark.createDataFrame([(i % 30,) for i in range(300)], "v int")
    out = {r["feature"]: (r["psi"], r["verdict"]) for r in
           drift.psi_report(df, df, {"v": _bins("v")}).collect()}
    psi, verdict = out["v"]
    assert verdict == "stable"
    # identical proportions: every term is (p-p)*ln(1) = 0 exactly
    assert psi == 0.0


def test_planted_shift_reads_major(spark):
    a = spark.createDataFrame([(5,)] * 90 + [(15,)] * 10, "v int")
    b = spark.createDataFrame([(5,)] * 10 + [(15,)] * 90, "v int")
    out = drift.psi_report(a, b, {"v": _bins("v")}).head()
    assert out["verdict"] == "major_shift"
    # hand-computed PSI: bins lo (0.9 vs 0.1) and mid (0.1 vs 0.9)
    eps = 1e-6
    want = sum((pa + eps - pb - eps) * math.log((pa + eps) / (pb + eps))
               for pa, pb in ((0.9, 0.1), (0.1, 0.9)))
    assert abs(out["psi"] - round(want, 6)) < 2e-6


def test_psi_partitioning_invariant(spark):
    a = spark.createDataFrame([(i % 25,) for i in range(500)], "v int")
    b = spark.createDataFrame([((i * 7) % 25,) for i in range(400)],
                              "v int")
    feats = {"v": _bins("v")}
    base = drift.psi_report(a, b, feats).head()["psi"]
    for parts in (1, 13):
        got = drift.psi_report(a.repartition(parts),
                               b.repartition(parts), feats).head()["psi"]
        assert got == base, parts


def test_null_bins_excluded_and_empty_features_rejected(spark):
    a = spark.createDataFrame([(1,), (None,)], "v int")
    b = spark.createDataFrame([(1,), (None,)], "v int")
    nullable = F.when(F.col("v").isNotNull(), F.lit("one"))
    out = drift.psi_report(a, b, {"v": nullable}).head()
    assert out["psi"] == 0.0 and out["verdict"] == "stable"
    with pytest.raises(ValueError, match="at least one"):
        drift.psi_report(a, b, {})


def test_streaming_drift_fold_equals_batch_exactly(spark, tmp_path):
    """X34: after streaming N batches through the monitor, report()
    must equal psi_report(baseline, concatenated_batches) EXACTLY —
    the folded integer cells are the same cells, the arithmetic tail
    is the same code. Also: replay of the last batch_id is a no-op, a
    behind-horizon id raises, and a shifted stream flips the alarm."""
    from real_time_iot_data_pipeline_project_spark.streaming.drift_stream import (
        StreamingDriftMonitor,
    )

    feats = {"v": _bins("v")}
    baseline = spark.createDataFrame(
        [(i % 30,) for i in range(300)], "v int")
    # batches drift toward the 'hi' bin over time
    batches = [
        spark.createDataFrame([(i % 30,) for i in range(100)], "v int"),
        spark.createDataFrame([(25,)] * 80 + [(5,)] * 20, "v int"),
        spark.createDataFrame([(27,)] * 100, "v int"),
    ]
    mon = StreamingDriftMonitor(feats, baseline,
                                str(tmp_path / "drift.json"))
    concat = batches[0]
    for b, df in enumerate(batches):
        mon.process_batch(df, b)
        if b:
            concat = concat.unionByName(df)

    got = [(r["feature"], r["psi"], r["verdict"])
           for r in mon.report(spark).collect()]
    want = [(r["feature"], r["psi"], r["verdict"])
            for r in drift.psi_report(baseline, concat, feats).collect()]
    assert got == want
    assert got[0][2] == "major_shift"   # the planted drift is visible

    # replay of the folded horizon: no-op
    before = mon._load()
    mon.process_batch(batches[2], 2)
    assert mon._load() == before
    # behind-horizon id: state/checkpoint mismatch must raise
    import pytest as _pytest
    with _pytest.raises(ValueError, match="different checkpoint"):
        mon.process_batch(batches[0], 0)


def test_streaming_drift_via_real_stream(spark, tmp_path):
    """The monitor's foreachBatch hook driven by a REAL availableNow
    stream must land on the same report as direct folding."""
    from real_time_iot_data_pipeline_project_spark.streaming.drift_stream import (
        StreamingDriftMonitor,
    )

    feats = {"v": _bins("v")}
    baseline = spark.createDataFrame(
        [(i % 30,) for i in range(120)], "v int")
    src = tmp_path / "src"
    src.mkdir()
    dfs = [spark.createDataFrame([(i % 30,) for i in range(60)], "v int"),
           spark.createDataFrame([(3,)] * 50, "v int")]
    for i, df in enumerate(dfs):
        df.coalesce(1).write.parquet(str(src / f"b{i}"))

    mon = StreamingDriftMonitor(feats, baseline,
                                str(tmp_path / "s.json"))
    stream = (spark.readStream.schema("v int")
              .option("maxFilesPerTrigger", "1").parquet(f"{src}/*"))
    q = (stream.writeStream.foreachBatch(mon.process_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["feature"]: (r["psi"], r["verdict"])
           for r in mon.report(spark).collect()}
    want = {r["feature"]: (r["psi"], r["verdict"]) for r in
            drift.psi_report(baseline, dfs[0].unionByName(dfs[1]),
                             feats).collect()}
    assert got == want


def test_streaming_drift_forward_gap_raises(spark, tmp_path):
    """A forward batch-id gap means a fresh/lost state file was paired
    with an ADVANCED checkpoint — folding would silently miss batches,
    so it must raise (the sequential-id contract, both directions)."""
    from real_time_iot_data_pipeline_project_spark.streaming.drift_stream import (
        StreamingDriftMonitor,
    )

    baseline = spark.createDataFrame([(1,)], "v int")
    mon = StreamingDriftMonitor({"v": _bins("v")}, baseline,
                                str(tmp_path / "g.json"))
    mon.process_batch(baseline, 0)
    with pytest.raises(ValueError, match="different checkpoint"):
        mon.process_batch(baseline, 5)


def _vec_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def test_embedding_drift_planted_move(spark):
    """X50 hand case: two well-separated centroids; the new release
    moves one vector from bucket A to bucket B (and drops another) —
    counts, exact per-mille shares and deltas all hand-computed; the
    spine keeps a centroid visible even when a release empties it."""
    from real_time_iot_data_pipeline_project_spark.operators import similarity

    a, b = [1.0, 0.0], [0.0, 1.0]
    old = _vec_df(spark, [(1, a), (2, a), (3, a), (4, b)])
    new = _vec_df(spark, [(1, a), (2, b), (3, a)])  # 2 moved, 4 dropped
    cents = _vec_df(spark, [(10, a), (20, b)]).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"))
    got = {r.centroid_id: (r.n_old, r.n_new, r.share_old_pm,
                           r.share_new_pm, r.delta_pm)
           for r in drift.embedding_drift(old, new, cents).collect()}
    assert got == {10: (3, 2, 750, 666, -84),
                   20: (1, 1, 250, 333, 83)}

    # spine: a release that empties a bucket keeps the row (occupancy
    # 0 IS the drift signal), and an empty release reads all-zero
    # shares instead of dividing by zero
    empty = _vec_df(spark, [])
    got2 = {r.centroid_id: (r.n_new, r.share_new_pm)
            for r in drift.embedding_drift(old, empty, cents).collect()}
    assert got2 == {10: (0, 0), 20: (0, 0)}


def test_embedding_drift_psi_equals_psi_from_cells(spark):
    """The PSI tail is the ONE psi_from_cells rule applied to the X50
    histogram — pinned by recomputing it from embedding_drift's own
    counts; identical releases read stable at psi 0."""
    a, b = [1.0, 0.0], [0.0, 1.0]
    old = _vec_df(spark, [(i, a if i % 3 else b) for i in range(1, 13)])
    new = _vec_df(spark, [(i, b if i % 4 else a) for i in range(1, 10)])
    cents = _vec_df(spark, [(10, a), (20, b)]).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"))
    got = drift.embedding_drift_psi(old, new, cents).collect()[0]
    cells = (drift.embedding_drift(old, new, cents)
             .select(F.lit("embedding_centroid").alias("feature"),
                     F.col("centroid_id").cast("string").alias("bin"),
                     F.col("n_old").alias("n_a"),
                     F.col("n_new").alias("n_b")))
    want = drift.psi_from_cells(cells).collect()[0]
    assert (got.feature, got.psi, got.verdict) == (
        want.feature, want.psi, want.verdict)

    same = drift.embedding_drift_psi(old, old, cents).collect()[0]
    assert same.psi == 0.0 and same.verdict == "stable"
