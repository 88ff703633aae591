"""Feature-hashing embedder (operators/embedding.py): unit-norm
geometry, partitioning invariance, sparse/dense agreement, and the
zero-UDF plan claim. Cross-engine exactness is registry q118's oracle
(verified bit-identical at sf0.001/0.01/0.1 with no rounding)."""

from __future__ import annotations

import math

import pytest

from real_time_iot_data_pipeline_project_spark.operators import embedding


def _docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),          # exact dup of 1
        (3, "completely different tokens here entirely"),
        (4, "the the the the"),                  # single token repeated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unit_norm_and_duplicate_docs_identical(spark):
    sp = embedding.hashing_embed_sparse(_docs(spark), dim=32)
    rows = sp.collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["bucket"]] = r["weight"]
    for d, vec in by_doc.items():
        assert math.isclose(sum(w * w for w in vec.values()), 1.0,
                            rel_tol=1e-12), d
    assert by_doc[1] == by_doc[2]          # identical text -> identical
    # cosine(1,3) well below 1 (disjoint token sets may still collide
    # in a 32-bucket space, but not align)
    dot = sum(w * by_doc[3].get(b, 0.0) for b, w in by_doc[1].items())
    assert dot < 0.9
    # doc 4: one distinct token -> exactly one bucket at weight ±1
    assert len(by_doc[4]) == 1
    assert abs(next(iter(by_doc[4].values()))) == 1.0


def test_partitioning_invariance(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, embedding.hashing_embed_sparse(
        docs.repartition(1), dim=32).collect()))
    b = sorted(map(tuple, embedding.hashing_embed_sparse(
        docs.repartition(7), dim=32).collect()))
    assert a == b


def test_dense_assembly_matches_sparse(spark):
    docs = _docs(spark)
    sp = embedding.hashing_embed_sparse(docs, dim=16)
    dense = {r["doc_id"]: list(r["embedding"]) for r in
             embedding.to_dense(sp, dim=16).collect()}
    sparse = {}
    for r in sp.collect():
        sparse.setdefault(r["doc_id"], {})[r["bucket"]] = r["weight"]
    for d, vec in dense.items():
        assert len(vec) == 16
        for b, v in enumerate(vec):
            assert v == sparse[d].get(b, 0.0), (d, b)


def test_fused_dense_matches_composition_exactly(spark):
    """hashing_embed_dense (round-16 fused plan: sort-free second
    aggregation instead of window + to_dense re-aggregation) must be
    row-for-row, bit-for-bit identical to the to_dense ∘ sparse
    composition — including a doc with EMPTY text being absent from
    both."""
    rows = [
        (1, "the cat sat on the mat"),
        (2, "completely different tokens here entirely"),
        (3, ""),                                  # no tokens: absent
        (4, "alpha beta gamma delta alpha beta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    comp = {r["doc_id"]: list(r["embedding"]) for r in embedding.to_dense(
        embedding.hashing_embed_sparse(docs, dim=16), dim=16).collect()}
    fused = {r["doc_id"]: list(r["embedding"]) for r in
             embedding.hashing_embed_dense(docs, dim=16).collect()}
    assert set(fused) == set(comp) == {1, 2, 4}
    for d in comp:
        assert fused[d] == comp[d], d     # exact doubles, no tolerance
    # the fused second pass must be a hash aggregate, not a window sort
    plan = embedding.hashing_embed_dense(
        docs, dim=16)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_embed_plan_is_jvm_only_and_validates_dim(spark):
    """The zero-UDF claim, plan-asserted: no Python boundary of any
    kind in the embed plan."""
    sp = embedding.hashing_embed_sparse(_docs(spark), dim=32)
    plan = sp._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
    with pytest.raises(ValueError, match="dim"):
        embedding.hashing_embed_sparse(_docs(spark), dim=0)


def test_unnormalized_weights_are_signed_counts(spark):
    sp = embedding.hashing_embed_sparse(_docs(spark), dim=32,
                                        normalize=False)
    for r in sp.collect():
        assert r["weight"] == int(r["weight"])   # integer-valued
    # doc 4 = 'the' x4 -> single bucket, |weight| = 4
    w4 = [r["weight"] for r in sp.collect() if r["doc_id"] == 4]
    assert len(w4) == 1 and abs(w4[0]) == 4.0
