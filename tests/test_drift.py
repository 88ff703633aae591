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
