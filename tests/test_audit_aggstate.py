"""Audit tier (operators/audit.py) and mergeable aggregate state
(warehouse/incremental.py) — semantic tests on synthesized dirty data
where every violation count is known by construction, plus the
state-fold invariant (any batch split == direct aggregate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_iot_data_pipeline_project_spark.operators import audit
from real_time_iot_data_pipeline_project_spark.warehouse import incremental as inc


def _dirty(spark):
    rows = [
        # (id, grp, qty, disc)
        (1, "a", 5.0, 0.1),
        (1, "a", 5.0, 0.1),     # duplicate (id, grp) pair
        (2, "b", None, 0.2),    # null qty
        (3, "c", -1.0, 1.5),    # non-positive qty AND out-of-range disc
        (4, "d", 2.0, -0.1),    # out-of-range disc
    ]
    return spark.createDataFrame(
        rows, "id long, grp string, qty double, disc double")


def test_column_checks_counts_are_exact(spark):
    df = _dirty(spark)
    rep = audit.column_checks(
        df,
        checks={
            "qty_not_null": F.col("qty").isNull(),
            "disc_range": (F.col("disc") < 0) | (F.col("disc") > 1),
            "qty_positive": F.col("qty") <= 0,
        },
        unique_keys={"pk_unique": ["id", "grp"]},
    )
    got = {r["check_name"]: r["n_violations"] for r in rep.collect()}
    assert got == {"qty_not_null": 1, "disc_range": 2,
                   "qty_positive": 1, "pk_unique": 1}


def test_column_checks_single_pass_plan(spark):
    """The whole tall report must come from ONE aggregation over the
    input — no per-check scan, no shuffle beyond the aggregate."""
    df = _dirty(spark)
    rep = audit.column_checks(
        df, checks={"qty_not_null": F.col("qty").isNull(),
                    "qty_positive": F.col("qty") <= 0})
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1
    assert "Generate" in plan or "stack" in plan.lower()


def test_fk_orphans_counts_unmatched_and_null_keys(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, ref long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    rep = audit.fk_orphans(child, parent, [("ref", "pk")], "fk")
    row = rep.collect()[0]
    # 99 matches nothing; NULL ref references nothing -> both orphans
    assert (row["check_name"], row["n_violations"]) == ("fk", 2)


def test_agg_state_fold_equals_direct_aggregate(spark):
    """The IVM invariant, on real data with a 3-way split: folding
    per-batch states must equal the direct aggregate over all rows —
    same n/total/min/max/mean, every key."""
    from real_time_iot_data_pipeline_project_spark import registry
    from tests.conftest import SF_SMOKE

    ev = registry._t(spark, SF_SMOKE, "events")
    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    state = inc.agg_state(batches[0], ["user_id"], "value")
    for b in batches[1:]:
        state = inc.merge_agg_states(
            state, inc.agg_state(b, ["user_id"], "value"), ["user_id"])
    folded = inc.finalize_agg_state(state)
    direct = inc.finalize_agg_state(inc.agg_state(ev, ["user_id"], "value"))
    assert folded.exceptAll(direct).count() == 0
    assert direct.exceptAll(folded).count() == 0


def test_agg_state_merge_is_order_free(spark):
    """Decimal sums: merging batches in either order yields identical
    state (the property that lets a distributed merge tree combine in
    whatever order tasks finish)."""
    from real_time_iot_data_pipeline_project_spark import registry
    from tests.conftest import SF_SMOKE

    ev = registry._t(spark, SF_SMOKE, "events")
    b0 = inc.agg_state(ev.filter(F.col("event_id") % 2 == 0),
                       ["user_id"], "value")
    b1 = inc.agg_state(ev.filter(F.col("event_id") % 2 == 1),
                       ["user_id"], "value")
    ab = inc.finalize_agg_state(inc.merge_agg_states(b0, b1, ["user_id"]))
    ba = inc.finalize_agg_state(inc.merge_agg_states(b1, b0, ["user_id"]))
    assert ab.exceptAll(ba).count() == 0
    assert ba.exceptAll(ab).count() == 0


def test_agg_state_empty_batch_is_identity(spark):
    """Merging an empty batch changes nothing (the quiet-period
    trigger case)."""
    from real_time_iot_data_pipeline_project_spark import registry
    from tests.conftest import SF_SMOKE

    ev = registry._t(spark, SF_SMOKE, "events")
    s = inc.agg_state(ev, ["user_id"], "value")
    empty = inc.agg_state(ev.filter(F.lit(False)), ["user_id"], "value")
    merged = inc.merge_agg_states(s, empty, ["user_id"])
    assert merged.exceptAll(s).count() == 0
    assert s.exceptAll(merged).count() == 0


def test_unique_check_is_null_safe(spark):
    """Null key parts must participate in the uniqueness check: two
    (u, null) rows are duplicates (1 surplus), and a null-key row is
    never silently dropped from the distinct count the way bare
    countDistinct(k1, k2) would drop it (VERDICT r6 item 9)."""
    rows = [
        (1, "x"), (1, "x"),     # plain duplicate -> 1 surplus
        (2, None), (2, None),   # null-key duplicate -> 1 surplus
        (3, None),              # unique despite null part -> 0 surplus
    ]
    df = spark.createDataFrame(rows, "id long, k string")
    rep = audit.column_checks(
        df, checks={}, unique_keys={"pk_unique": ["id", "k"]})
    got = {r["check_name"]: r["n_violations"] for r in rep.collect()}
    # bare countDistinct would report 5 - 1 = 4; null-safe reports 2
    assert got == {"pk_unique": 2}


def test_corpus_diff_statuses_and_normalization(spark):
    """X46: per-id diff statuses on a planted pair of releases — and a
    whitespace/case reformat is UNCHANGED (content identity is the
    normalized fingerprint, so reformats don't trigger re-processing)."""
    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "kept  doc"),
         (4, "to be dropped")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "alpha beta"),          # unchanged
         (2, "gamma delta EDITED"),  # changed
         (3, "  Kept   DOC "),       # reformat -> unchanged
         (5, "brand new doc")],      # added
        "doc_id long, text string")
    got = {r.doc_id: r.status for r in
           audit.corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "unchanged",
                   4: "removed", 5: "added"}

    # NULL-text docs: presence comes from the SIDE, not the (null)
    # fingerprint — a null-text doc present in both releases is
    # unchanged, one only in old is removed (review catch: the
    # fp-nullness rule inverted these into 'added')
    o2 = spark.createDataFrame([(1, None), (3, None)],
                               "doc_id long, text string")
    n2 = spark.createDataFrame([(1, "hello")],
                               "doc_id long, text string")
    got2 = {r.doc_id: r.status for r in
            audit.corpus_diff(o2, n2).collect()}
    assert got2 == {1: "changed", 3: "removed"}


def test_corpus_diff_absorbs_duplicate_listings(spark):
    """A release carrying the same (id, content) twice — a non-deduped
    union of manifests — must yield ONE diff row per id, not one per
    old×new duplicate pair (the full-outer join would otherwise fan
    out multiplicatively; ADVICE r11, mirroring incremental_annotate's
    old-side guard)."""
    old = spark.createDataFrame(
        [(1, "alpha"), (1, "alpha"), (2, "beta")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "alpha"), (1, "alpha"), (1, "alpha"), (2, "beta edited")],
        "doc_id long, text string")
    rows = audit.corpus_diff(old, new).collect()
    assert len(rows) == 2
    got = {r.doc_id: r.status for r in rows}
    assert got == {1: "unchanged", 2: "changed"}


def test_corpus_diff_refuses_conflicting_duplicate_ids(spark):
    """VERDICT r12 item 5: duplicate ids with CONFLICTING fingerprints
    have no single diff answer (no order column exists, so latest-wins
    is undefined) — the operator raises loudly on either side instead
    of silently fanning out one row per old×new duplicate pair."""
    import pytest

    clean = spark.createDataFrame([(1, "alpha"), (2, "beta")],
                                  "doc_id long, text string")
    conflicted = spark.createDataFrame(
        [(1, "alpha"), (1, "NOT alpha"), (2, "beta")],
        "doc_id long, text string")
    with pytest.raises(ValueError, match="CONFLICTING"):
        audit.corpus_diff(conflicted, clean)
    with pytest.raises(ValueError, match="CONFLICTING"):
        audit.corpus_diff(clean, conflicted)
    # identical-content duplicates still absorb silently (above), and
    # NULL-text duplicates are identical content too (null-safe fp)
    nulldup = spark.createDataFrame([(1, None), (1, None)],
                                    "doc_id long, text string")
    got = audit.corpus_diff(nulldup, clean).collect()
    assert {r.doc_id for r in got} == {1, 2}


def test_corpus_diff_validate_false_skips_eager_guard(spark):
    """ADVICE r13: the conflicting-id guard is an EAGER job (two
    narrow-column scans per diff) — hot callers whose releases are
    already writer-deduped can opt out with validate=False.  The
    returned diff is identical on clean input, and the guard's raise
    is genuinely skipped (no eager exception on conflicted input —
    the caller owns the precondition)."""
    old = spark.createDataFrame([(1, "alpha"), (2, "beta")],
                                "doc_id long, text string")
    new = spark.createDataFrame([(1, "alpha"), (3, "gamma")],
                                "doc_id long, text string")
    a = sorted(audit.corpus_diff(old, new).collect())
    b = sorted(audit.corpus_diff(old, new, validate=False).collect())
    assert a == b
    conflicted = spark.createDataFrame(
        [(1, "alpha"), (1, "NOT alpha")], "doc_id long, text string")
    # plan construction must not raise without validation
    plan = audit.corpus_diff(conflicted, new, validate=False)
    assert plan is not None


def test_incremental_annotate_reuses_not_recomputes(spark):
    """X47 plumbing: unchanged rows must carry the OLD release's stored
    annotation (proving reuse — the annotator is tagged so a recompute
    would be visible), changed/added rows get fresh values, and a
    NULL-text row conservatively re-annotates."""
    old = spark.createDataFrame(
        [(1, "alpha", "old"), (2, "beta", "old"), (4, None, "old")],
        "doc_id long, text string, tag string")
    new = spark.createDataFrame(
        [(1, "alpha"),    # byte-identical -> reuse 'old'
         (2, "beta!"),    # changed -> fresh
         (3, "gamma"),    # added -> fresh
         (4, None)],      # null text -> conservative fresh
        "doc_id long, text string")

    def ann(d):
        return d.select("doc_id", F.lit("fresh").alias("tag"))

    got = {r.doc_id: r.tag for r in
           audit.incremental_annotate(old, new, ann).collect()}
    assert got == {1: "old", 2: "fresh", 3: "fresh", 4: "fresh"}


def test_incremental_annotate_guards_and_duplicate_old(spark):
    """A duplicated (id, text) row in the previous release must not
    inflate the output (one row per new row, exactly), and a caller
    column colliding with the reserved working name fails loudly."""
    import pytest

    old = spark.createDataFrame(
        [(1, "alpha", "old"), (1, "alpha", "old"), (2, "beta", "old")],
        "doc_id long, text string, tag string")
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string")

    def ann(d):
        return d.select("doc_id", F.lit("fresh").alias("tag"))

    out = audit.incremental_annotate(old, new, ann).collect()
    assert sorted((r.doc_id, r.tag) for r in out) == [(1, "old"),
                                                      (2, "old")]

    bad = new.withColumn("__fp", F.lit("x"))
    with pytest.raises(ValueError, match="__fp"):
        audit.incremental_annotate(old, bad, ann)
