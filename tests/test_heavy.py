"""Deterministic heavy hitters (operators/heavy.py): the candidate
pass may not MISS any true heavy hitter (Misra-Gries no-miss bound),
and the exact recount must make the output identical to a plain
domain-sized GROUP BY/HAVING — under any partitioning."""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import functions as F

from real_time_iot_data_pipeline_project_spark.operators import heavy


def _exact(rows, support):
    """Exact-rational reference: count*den >= num*n for the Fraction of
    the decimal the caller wrote — the operator's documented semantics
    (IEEE ceil(support*n) shifts the cutoff for e.g. support=0.07)."""
    from fractions import Fraction

    frac = Fraction(str(support))
    counts: dict = {}
    for v in rows:
        if v is not None:
            counts[v] = counts.get(v, 0) + 1
    n = sum(counts.values())
    return {(v, c) for v, c in counts.items()
            if c * frac.denominator >= frac.numerator * n}


def test_heavy_hitters_equal_exact_groupby(spark):
    rng = random.Random(7)
    # zipf-ish skew: value i appears ~ 2000/i times
    rows = [f"v{i}" for i in range(1, 60) for _ in range(2000 // i)]
    rng.shuffle(rows)
    df = spark.createDataFrame([(v,) for v in rows], "x string")
    for support in (0.2, 0.05, 0.01):
        got = {(r["x"], r["count"]) for r in
               heavy.heavy_hitters(df, "x", support).collect()}
        assert got == _exact(rows, support), support


def test_heavy_hitters_partitioning_invariant(spark):
    """Misra-Gries candidate SETS depend on partitioning, but the exact
    recount + threshold filter must erase that: identical output under
    1, 7 and 32 partitions."""
    rng = random.Random(11)
    rows = [f"v{i}" for i in range(1, 40) for _ in range(1000 // i)]
    rng.shuffle(rows)
    df = spark.createDataFrame([(v,) for v in rows], "x string")
    results = []
    for parts in (1, 7, 32):
        got = {(r["x"], r["count"]) for r in heavy.heavy_hitters(
            df.repartition(parts), "x", 0.03).collect()}
        results.append(got)
    assert results[0] == results[1] == results[2] == _exact(rows, 0.03)


def test_heavy_hitters_threshold_boundary(spark):
    """An item exactly AT ceil(support*n) is included; one occurrence
    below is excluded — planted construction, fixed counts."""
    # n = 100: whale 20, edge exactly 10, below 9, filler 61 unique-ish
    rows = (["whale"] * 20 + ["edge"] * 10 + ["below"] * 9
            + [f"f{i}" for i in range(61)])
    df = spark.createDataFrame([(v,) for v in rows], "x string")
    got = {(r["x"], r["count"]) for r in
           heavy.heavy_hitters(df, "x", 0.10).collect()}
    assert got == {("whale", 20), ("edge", 10)}


def test_heavy_hitters_ignores_nulls_and_validates_support(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), (None,), (None,), ("b",)], "x string")
    # nulls excluded from both candidates and n: n=3, support 0.5 -> a
    got = {(r["x"], r["count"]) for r in
           heavy.heavy_hitters(df, "x", 0.5).collect()}
    assert got == {("a", 2)}
    with pytest.raises(ValueError, match="support"):
        heavy.heavy_hitters(df, "x", 0.0)


def test_heavy_hitters_exact_rational_threshold(spark):
    """support=0.07, n=100: IEEE doubles give 0.07*100 =
    7.000000000000001 -> ceil = 8, wrongly excluding an item at exactly
    the documented 7% frequency. The exact integer threshold
    (count*100 >= 7*n) must include it."""
    assert math.ceil(0.07 * 100) == 8  # the double-math trap is real
    rows = ["edge"] * 7 + [f"f{i}" for i in range(93)]
    df = spark.createDataFrame([(v,) for v in rows], "x string")
    got = {(r["x"], r["count"]) for r in
           heavy.heavy_hitters(df, "x", 0.07).collect()}
    assert ("edge", 7) in got


def test_weighted_mg_matches_classic_no_miss():
    """The vectorized weighted-MG update must satisfy the same no-miss
    bound as the classic row-at-a-time reference: feeding pre-aggregated
    (value, weight) pairs in any order may not lose a true heavy
    hitter."""
    rng = random.Random(17)
    for trial in range(20):
        n, k = 500, rng.randint(2, 20)
        vals = [rng.randint(0, 30) for _ in range(n)]
        counts: dict = {}
        for v in vals:
            counts[v] = counts.get(v, 0) + 1
        # simulate batch pre-aggregation: shuffled distinct pairs,
        # split across several "batches"
        pairs = list(counts.items())
        rng.shuffle(pairs)
        counters: dict = {}
        for v, w in pairs:
            heavy._mg_update_weighted(counters, v, w, k)
        for v, c in counts.items():
            if c > n / k:
                assert v in counters, (trial, v, c, n, k)


def test_misra_gries_no_miss_property():
    """Pure-Python check of the bound the distributed guarantee rests
    on: any value with frequency ≥ n/k survives a capacity-k summary."""
    rng = random.Random(3)
    for trial in range(20):
        n, k = 500, rng.randint(2, 20)
        vals = [rng.randint(0, 30) for _ in range(n)]
        cands = set(heavy._misra_gries_candidates(vals, k))
        counts: dict = {}
        for v in vals:
            counts[v] = counts.get(v, 0) + 1
        for v, c in counts.items():
            if c > n / k:
                assert v in cands, (trial, v, c, n, k)


def test_grouped_heavy_hitters_equal_exact_per_group(spark):
    """Per-group output equals exact per-group counting with each
    group's OWN threshold — and a value heavy in one group must not
    leak into another group's result."""
    rng = random.Random(5)
    rows = []
    # group A: 'boiler' dominates; group B: 'other' dominates, 'boiler'
    # rare (below B's threshold)
    rows += [("A", "boiler")] * 50 + [("A", f"a{i}") for i in range(50)]
    rows += [("B", "other")] * 40 + [("B", "boiler")] * 2 \
        + [("B", f"b{i}") for i in range(58)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "g string, x string")
    got = {(r["g"], r["x"], r["count"]) for r in heavy.grouped_heavy_hitters(
        df.repartition(9), ["g"], "x", 0.10).collect()}
    assert got == {("A", "boiler", 50), ("B", "other", 40)}

    # cross-check against python exact per group at another support
    got2 = {(r["g"], r["x"], r["count"]) for r in heavy.grouped_heavy_hitters(
        df, ["g"], "x", 0.02).collect()}
    want2 = set()
    for g in ("A", "B"):
        vals = [x for gg, x in rows if gg == g]
        for v, c in _exact(vals, 0.02):
            want2.add((g, v, c))
    assert got2 == want2


def test_grouped_heavy_hitters_planted_whale_group(spark):
    """Skew interaction (VERDICT r7 stretch 8): one whale group holds
    ~90% of all rows. The recount keys on the (group, value) PAIR so
    the whale spreads across its token values; the totals join's
    group-keyed shuffle moves only candidate-count rows (bounded by
    k·tasks per group), never data-sized rows — output must stay exact
    under heavy group skew and any partitioning."""
    rng = random.Random(23)
    rows = [("whale", f"t{i % 12}") for i in range(1800)]
    rows += [(f"s{j}", f"u{i}") for j in range(20) for i in range(10)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "g string, x string")
    for parts in (1, 13):
        got = {(r["g"], r["x"], r["count"]) for r in
               heavy.grouped_heavy_hitters(
                   df.repartition(parts), ["g"], "x", 0.05).collect()}
        want = set()
        for g in {"whale", *(f"s{j}" for j in range(20))}:
            vals = [x for gg, x in rows if gg == g]
            for v, c in _exact(vals, 0.05):
                want.add((g, v, c))
        assert got == want, parts


# --- hypothesis property tests (pure Python, no Spark session) ---

from fractions import Fraction  # noqa: E402

from hypothesis import given, settings, strategies as st  # noqa: E402


@given(
    st.lists(st.tuples(st.integers(0, 20), st.integers(1, 50)),
             min_size=1, max_size=60),
    st.integers(1, 15),
)
@settings(max_examples=300, deadline=None)
def test_weighted_mg_no_miss_hypothesis(pairs, k):
    """Arbitrary (value, weight) sequences — duplicates, any order, any
    k: every item with total weight > n/k must survive the weighted-MG
    summary (the bound the distributed candidate pass rests on)."""
    counters: dict = {}
    for v, w in pairs:
        heavy._mg_update_weighted(counters, v, w, k)
    totals: dict = {}
    for v, w in pairs:
        totals[v] = totals.get(v, 0) + w
    n = sum(totals.values())
    for v, c in totals.items():
        if c > n / k:
            assert v in counters, (v, c, n, k)
    # summary stays bounded
    assert len(counters) <= k


@given(
    st.decimals(min_value="0.000001", max_value="1",
                allow_nan=False, allow_infinity=False, places=6),
    st.integers(0, 10_000),
    st.integers(1, 10_000),
)
@settings(max_examples=300, deadline=None)
def test_integer_threshold_equals_rational_ceil(support_dec, count, n):
    """The shipped predicate count*den >= num*n is exactly
    count >= ceil(support*n) under RATIONAL arithmetic, for any decimal
    support — the property the Fraction rewrite claims (IEEE-double
    ceil disagrees at boundaries like 0.07*100)."""
    frac = Fraction(str(support_dec))
    lhs = count * frac.denominator >= frac.numerator * n
    exact_threshold = -(-(frac.numerator * n) // frac.denominator)  # ceil
    rhs = count >= exact_threshold
    assert lhs == rhs


def test_streaming_fold_matches_batch_oracle(spark, tmp_path):
    """VERDICT r8 item 7: the foreachBatch streaming twin. Fold-oracle
    chain — after streaming all batches through the k-bounded MG state:
    (a) refine_exact over the concatenated stream == batch
    heavy_hitters (exact set AND counts), (b) no true heavy hitter is
    missing from the live candidates, (c) every live estimate obeys
    est ≤ true ≤ est + n//(k+1) (the mergeable-MG bound)."""
    from real_time_iot_data_pipeline_project_spark.streaming.heavy_stream import (
        StreamingHeavyHitters,
    )

    support = 0.05
    src = tmp_path / "src"
    src.mkdir()
    rng = random.Random(7)
    for b in range(3):
        toks = (["hot"] * 40 + ["warm"] * 12
                + [f"rare{b}_{i}" for i in range(30)]
                + ["semi"] * (8 if b == 0 else 2))
        rng.shuffle(toks)
        spark.createDataFrame(
            [(t,) for t in toks], "token string"
        ).coalesce(2).write.parquet(str(src / f"b{b}"))

    shh = StreamingHeavyHitters("token", support,
                                str(tmp_path / "hh_state.json"))
    stream = (spark.readStream.schema("token string")
              .option("maxFilesPerTrigger", "1").parquet(f"{src}/*"))
    q = (stream.writeStream.foreachBatch(shh.process_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    concat = spark.read.parquet(f"{src}/*")
    exact = {(r["token"], r["count"]) for r in
             heavy.heavy_hitters(concat, "token", support).collect()}
    refined = {(r["token"], r["count"]) for r in
               shh.refine_exact(concat).collect()}
    assert refined == exact and exact, (refined, exact)

    counters, n = shh.snapshot()
    truth = {r["token"]: r["cnt"] for r in
             concat.groupBy("token")
             .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert n == sum(truth.values())
    # (b) no-miss: true frequency ≥ support ⇒ present in candidates
    for v, cnt in truth.items():
        if cnt * 20 >= n:          # support 0.05 = 1/20 exactly
            assert v in counters, v
    # (c) mergeable-MG bound on every surviving estimate
    for v, est in counters.items():
        assert est <= truth[v], (v, est, truth[v])
        assert truth[v] - est <= n // (shh.k + 1), (v, est, truth[v])
    # live estimates surface the same numbers
    ests = {r["token"]: r["est_count"]
            for r in shh.estimates(spark).collect()}
    assert ests == {v: int(w) for v, w in counters.items()}


def test_streaming_fold_replay_is_noop_and_state_guarded(spark, tmp_path):
    """A foreachBatch replay of an already-folded batch_id must not
    double-count (exactly-once on restart), and reusing a state file
    with a different support/k must fail loudly."""
    from real_time_iot_data_pipeline_project_spark.streaming.heavy_stream import (
        StreamingHeavyHitters,
    )

    state = str(tmp_path / "s.json")
    shh = StreamingHeavyHitters("token", 0.25, state)
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 2, "token string")
    shh.process_batch(df, 0)
    snap1 = shh.snapshot()
    shh.process_batch(df, 0)   # replay: must be a no-op
    assert shh.snapshot() == snap1
    shh.process_batch(df, 1)   # a NEW batch does fold
    _, n2 = shh.snapshot()
    assert n2 == 16

    # a batch_id BEHIND the fold horizon = state paired with a
    # different checkpoint (fresh checkpoints restart at 0) — must
    # raise, not silently undercount
    with pytest.raises(ValueError, match="different checkpoint"):
        shh.process_batch(df, 0)

    with pytest.raises(ValueError, match="fresh state path"):
        StreamingHeavyHitters("token", 0.5, state).process_batch(df, 2)


def test_streaming_fold_state_stays_k_bounded_over_many_batches(spark, tmp_path):
    """O(1)-state soak for the streaming fold: across 40 batches with
    churning vocabularies, the persisted state never exceeds k
    counters (the MG capacity), the file stays KB-sized, and the final
    refine_exact over the concatenation still equals the batch
    operator — bounded state did not cost the no-miss guarantee."""
    import os as _os

    from real_time_iot_data_pipeline_project_spark.streaming.heavy_stream import (
        StreamingHeavyHitters,
    )

    support = 0.1          # k = 10
    state = str(tmp_path / "soak.json")
    shh = StreamingHeavyHitters("token", support, state)
    all_rows = []
    for b in range(40):
        toks = (["alpha"] * 12 + ["beta"] * 5
                + [f"churn{b}_{i}" for i in range(25)])
        all_rows.extend(toks)
        shh.process_batch(
            spark.createDataFrame([(t,) for t in toks], "token string"),
            b)
        counters, n = shh.snapshot()
        assert len(counters) <= shh.k, (b, len(counters))
        assert _os.path.getsize(state) < 4096, b
        assert n == len(all_rows)

    concat = spark.createDataFrame([(t,) for t in all_rows],
                                   "token string")
    exact = {(r["token"], r["count"]) for r in
             heavy.heavy_hitters(concat, "token", support).collect()}
    refined = {(r["token"], r["count"]) for r in
               shh.refine_exact(concat).collect()}
    assert refined == exact
    assert ("alpha", 480) in exact


def test_streaming_fold_forward_gap_raises(spark, tmp_path):
    """A forward batch-id gap = fresh/lost state on an advanced
    checkpoint: folding would silently miss batches and void the
    no-miss guarantee, so the sequential-id contract raises."""
    from real_time_iot_data_pipeline_project_spark.streaming.heavy_stream import (
        StreamingHeavyHitters,
    )

    shh = StreamingHeavyHitters("token", 0.5, str(tmp_path / "g.json"))
    df = spark.createDataFrame([("a",)], "token string")
    shh.process_batch(df, 0)
    with pytest.raises(ValueError, match="different checkpoint"):
        shh.process_batch(df, 2)
