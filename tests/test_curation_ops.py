"""Unit/property tests for the sampling / mixing / packing / chunk-dedup /
PII / quantization operator tier (the round-3 training-data extensions).

Oracle parity for the registry queries (q61-q69) is covered by
tests/test_oracle_parity.py; these tests pin the SEMANTICS on planted
inputs where the expected answer is hand-computable.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from real_time_iot_data_pipeline_project_spark.functions import textfns
from real_time_iot_data_pipeline_project_spark.operators import (
    dedup,
    packing,
    quantize,
    sampling,
    textops,
)


def _bucket(salt: str, key, buckets: int = 100) -> int:
    """Python replica of sampling.sample_bucket (md5-based, portable)."""
    h = int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:15], 16)
    return h % buckets


# ---------------------------------------------------------------- sampling

def test_hash_sample_deterministic_subset_and_nested(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    s20 = sorted(r.k for r in sampling.hash_sample(df, "k", 20).collect())
    s20_again = sorted(r.k for r in sampling.hash_sample(df, "k", 20).collect())
    s50 = set(r.k for r in sampling.hash_sample(df, "k", 50).collect())
    assert s20 == s20_again  # deterministic
    assert set(s20) <= s50  # nested: rate 20 ⊂ rate 50
    assert s20 == sorted(k for k in range(1000) if _bucket("sample", k) < 20)
    # rate lands near target (md5 uniformity)
    assert 120 <= len(s20) <= 280


def test_stratified_sample_exact_membership(spark):
    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(400)]
    df = spark.createDataFrame(rows, "k long, lang string")
    out = sampling.stratified_sample(
        df, key="k", stratum="lang", rates_pct={"en": 70, "zh": 10}
    ).collect()
    expected = {
        (i, lang)
        for i, lang in rows
        if _bucket("sample", i) < (70 if lang == "en" else 10)
    }
    assert {(r.k, r.lang) for r in out} == expected


def test_shard_assign_range_and_balance(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    out = sampling.shard_assign(df, "k", 16).groupBy("shard").count().collect()
    shards = {r.shard: r["count"] for r in out}
    assert set(shards) <= set(range(16)) and len(shards) == 16
    assert max(shards.values()) < 3 * min(shards.values())  # md5-uniform


def test_upsample_by_weight_copy_counts(spark):
    rows = [(i, "en" if i < 100 else "fr") for i in range(200)]
    df = spark.createDataFrame(rows, "k long, lang string")
    out = (
        sampling.upsample_by_weight(df, key="k", stratum="lang",
                                    weights={"en": 0.5, "fr": 2.5})
        .groupBy("k", "lang").count().collect()
    )
    got = {r.k: r["count"] for r in out}
    for i, lang in rows:
        w = 0.5 if lang == "en" else 2.5
        expect = math.floor(w) + (1 if _bucket("mix", i) < 50 else 0)
        assert got.get(i, 0) == expect, (i, lang)


# ---------------------------------------------------------------- packing

def _greedy(tokens: list[int], cap: int) -> list[int]:
    bins, bin_id, fill = [], 0, 0
    for j, n in enumerate(tokens):
        if j == 0:
            fill = n
        elif fill + n > cap:
            bin_id, fill = bin_id + 1, n
        else:
            fill += n
        bins.append(bin_id)
    return bins


def test_pack_sequences_matches_greedy_reference(spark):
    toks = [60, 60, 30, 128, 5, 200, 1]
    rows = [(0, i, t) for i, t in enumerate(toks)] + [(1, i, 100) for i in range(3)]
    df = spark.createDataFrame(rows, "shard long, doc_id long, n_tok long")
    out = packing.pack_sequences(df, tokens_col="n_tok", capacity=128)
    got = {(r.shard, r.doc_id): r.bin_id for r in out.collect()}
    assert [got[(0, i)] for i in range(len(toks))] == _greedy(toks, 128)
    # [60,60]=120 | [30]+128 overflow -> 30 alone? no: greedy = 0,0,1,2,3,4,4
    assert [got[(1, i)] for i in range(3)] == [0, 1, 2]  # 100+100 > 128 each


def test_pack_sequences_capacity_invariant(spark):
    df = (
        spark.range(0, 300).withColumnRenamed("id", "doc_id")
        .withColumn("n_tok", (F.col("doc_id") * 37 % 90 + 5).cast("long"))
    )
    packed = packing.pack_sequences(
        sampling.shard_assign(df, "doc_id", 4), tokens_col="n_tok", capacity=128
    )
    stats = packing.packing_stats(packed, "n_tok", 128)
    bad = stats.filter((F.col("fill_tokens") > 128) & (F.col("n_docs") > 1)).count()
    assert bad == 0  # a bin only exceeds capacity when it holds one over-long doc
    # bins are contiguously numbered from 0 within each shard
    per_shard = stats.groupBy("shard").agg(
        F.min("bin_id").alias("mn"), F.max("bin_id").alias("mx"),
        F.count(F.lit(1)).alias("n")
    ).collect()
    for r in per_shard:
        assert r.mn == 0 and r.n == r.mx + 1


# ------------------------------------------------------------- chunk dedup

def test_chunk_dedup_first_occurrence_wins(spark):
    a = " ".join(f"a{i}" for i in range(8))
    b = " ".join(f"b{i}" for i in range(8))
    c = "c0 c1 c2 c3"
    df = spark.createDataFrame(
        [(1, f"{a} {b}"), (2, f"{b} {c}")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in dedup.chunk_dedup(df, chunk_tokens=8).collect()}
    assert (got[1].n_chunks, got[1].n_chunks_kept) == (2, 2)
    assert (got[2].n_chunks, got[2].n_chunks_kept) == (2, 1)  # b claimed by doc 1
    assert got[1].kept_fp == hashlib.md5(f"{a} {b}".encode()).hexdigest()
    assert got[2].kept_fp == hashlib.md5(c.encode()).hexdigest()


def test_chunk_dedup_fully_duplicated_doc(spark):
    a = " ".join(f"a{i}" for i in range(8))
    df = spark.createDataFrame([(1, a), (2, a)], "doc_id long, text string")
    got = {r.doc_id: r for r in dedup.chunk_dedup(df, chunk_tokens=8).collect()}
    assert got[2].n_chunks_kept == 0
    assert got[2].kept_fp == hashlib.md5(b"").hexdigest()


def test_degenerate_docs_yield_no_chunks_or_windows(spark):
    """Empty / whitespace-only docs are dropped before chunking and
    windowing — they must not share a '' chunk (which would collapse
    them all onto one survivor) or count 1 phantom token per window."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   \t  "), (3, "real tokens here")],
        "doc_id long, text string",
    )
    chunks = dedup.doc_chunks(df, chunk_tokens=8).collect()
    assert {r.doc_id for r in chunks} == {3}
    dd = {r.doc_id: r for r in dedup.chunk_dedup(df, chunk_tokens=8).collect()}
    assert set(dd) == {3}
    wins = packing.split_documents(df, window_tokens=4, stride=2).collect()
    assert {r.doc_id for r in wins} == {3}
    assert all(r.n_win_tokens >= 1 and r.window_fp != hashlib.md5(b"").hexdigest()
               for r in wins)


def test_pack_sequences_awkward_column_names(spark):
    """Output schema is built as a StructType, not a DDL string — shard/
    order/tokens columns named with spaces or reserved words work."""
    rows = [(0, i, 50) for i in range(4)]
    df = spark.createDataFrame(rows, ["the shard", "order", "token count"])
    out = packing.pack_sequences(
        df, tokens_col="token count", capacity=128,
        shard_col="the shard", order_col="order",
    )
    got = {r["order"]: r.bin_id for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1}


# -------------------------------------------------------------------- PII

def test_pii_redaction_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b-c_d@ex-ample.io thanks"),
            (2, "call 555-123-4567 or 555-000-1111 now"),
            (3, "clean text with no pii at all"),
            (4, "x@y.io and 123-456-7890 both"),
        ],
        "doc_id long, text string",
    )
    ne, np_ = textfns.pii_counts("text")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id", ne.alias("ne"), np_.alias("np"),
            textfns.redact_pii("text").alias("red"),
        ).collect()
    }
    assert (out[1].ne, out[1].np) == (1, 0)
    assert out[1].red == "mail me at <EMAIL> thanks"
    assert (out[2].ne, out[2].np) == (0, 2)
    assert out[2].red == "call <PHONE> or <PHONE> now"
    assert (out[3].ne, out[3].np) == (0, 0) and out[3].red == out[3].red
    assert out[4].red == "<EMAIL> and <PHONE> both"


# ----------------------------------------------------------- quantization

def test_quantize_error_exact_at_range_endpoints(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 5.0]), (2, [10.0, 5.0])], "vec_id long, embedding array<float>"
    )
    out = {r.vec_id: r for r in quantize.quantize_error(df).collect()}
    # endpoints reconstruct exactly; constant dim contributes 0 error, code 0
    assert out[1].q_sum == 0 and out[1].mse == 0.0
    assert out[2].q_sum == 255 and out[2].mse == 0.0


def test_quantize_error_bounded_by_step(spark):
    df = spark.createDataFrame(
        [(1, [0.0]), (2, [10.0]), (3, [0.37])], "vec_id long, embedding array<float>"
    )
    out = {r.vec_id: r for r in quantize.quantize_error(df).collect()}
    step = 10.0 / 255
    assert 0 < out[3].mse <= step * step  # floor error < one grid step


def test_pq_encode_and_adc_match_python_replay(spark):
    """X57 hand case: codes and ADC distances equal a full python
    replication — md5-ordered codebook sample, per-subspace argmin
    with the (dist ASC, code ASC) tie-break, LUT sum with the decimal
    pre-sum quantization — and ADC(q, codes(v)) equals the exact l2²
    between q and v's RECONSTRUCTION from its codewords."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    rows = [(i, [math.sin(i * 7 + j) for j in range(8)])
            for i in range(20)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")
    m, d, kc = 4, 2, 3
    cb = quantize.pq_codebooks(df, m=m, k=kc)
    codes = {(r.vec_id, r.sub_id): r.code
             for r in quantize.pq_encode(df, cb).collect()}
    queries = (df.where(F.col("vec_id").isin(0, 1))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qvec")))
    got = {(r.query_id, r.vec_id): r.adc_dist
           for r in quantize.pq_adc_topk(queries, cb, codes=quantize
                                         .pq_encode(df, cb), k=20)
           .collect()}

    # python replay — NOTE float32 storage: replicate by round-trip
    import struct as _s

    def f32(x):
        return _s.unpack("f", _s.pack("f", x))[0]

    vecs = {i: [f32(x) for x in v] for i, v in rows}
    order = sorted(vecs, key=lambda i: (
        hashlib.md5(str(i).encode()).hexdigest(), i))
    sample = order[:kc]

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def l2(a, b):
        return dot(a, a) - 2.0 * dot(a, b) + dot(b, b)

    cbooks = {(j, c + 1): vecs[sid][j * d:(j + 1) * d]
              for c, sid in enumerate(sample) for j in range(m)}
    for i, v in vecs.items():
        for j in range(m):
            sv = v[j * d:(j + 1) * d]
            best = min((l2(sv, cbooks[(j, c)]), c)
                       for c in range(1, kc + 1))
            assert codes[(i, j)] == best[1], (i, j)
    for qid in (0, 1):
        qv = vecs[qid]
        for i in vecs:
            total = Decimal(0)
            recon = []
            for j in range(m):
                term = l2(qv[j * d:(j + 1) * d],
                          cbooks[(j, codes[(i, j)])])
                total += Decimal(repr(term)).quantize(
                    Decimal("1.000000000000"),
                    rounding=ROUND_HALF_UP)
                recon += cbooks[(j, codes[(i, j)])]
            assert got[(qid, i)] == pytest.approx(
                round(float(total), 6), abs=2e-6)
            # ADC == exact distance to the reconstruction (per-subspace
            # l2² terms are additive over the concatenation)
            assert got[(qid, i)] == pytest.approx(
                l2(qv, recon), abs=1e-5)

    with pytest.raises(ValueError, match="divisor"):
        quantize.pq_codebooks(df, m=3, k=kc)


def test_adc_shuffle_lut_fallback_identical(spark):
    """ADVICE r13: broadcast_lut=False swaps the |queries|·m·k LUT
    broadcast for a shuffle-hash join (the nb_classify
    broadcast_model precedent) — the escape hatch for an unbounded
    query table.  Results are identical across pq_adc_topk, ivfpq_topk
    and ivfpq_residual_topk."""
    import math

    df = spark.createDataFrame(
        [(i, [float(math.sin(i * 7 + j)) for j in range(8)])
         for i in range(30)],
        "vec_id long, embedding array<float>")
    queries = (df.where(F.col("vec_id").isin(0, 1, 2))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qvec")))
    cb = quantize.pq_codebooks(df, m=4, k=3)
    codes = quantize.pq_encode(df, cb)
    a = sorted(quantize.pq_adc_topk(queries, cb, codes, k=5).collect())
    b = sorted(quantize.pq_adc_topk(queries, cb, codes, k=5,
                                    broadcast_lut=False).collect())
    assert a == b
    kw = dict(n_centroids=4, nprobe=2, m=4, kc=3, k=5)
    assert (sorted(quantize.ivfpq_topk(df, queries, **kw).collect())
            == sorted(quantize.ivfpq_topk(df, queries,
                                          broadcast_lut=False,
                                          **kw).collect()))
    assert (sorted(quantize.ivfpq_residual_topk(
                df, queries, **kw).collect())
            == sorted(quantize.ivfpq_residual_topk(
                df, queries, broadcast_lut=False, **kw).collect()))


def test_pq_recall_report_counts_and_spine(spark):
    """X60: the report's n_hits equal the overlap between the (already
    replay-pinned) ADC top-k at each codebook size and the python
    brute-force full-precision l2 top-k; the (k_codes × query) spine
    keeps every rung visible with integer recall."""
    import math

    rows = [(i, [math.sin(i * 5 + j) for j in range(8)])
            for i in range(25)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")
    queries = (df.where(F.col("vec_id").isin(0, 1))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qvec")))
    got = {(r.k_codes, r.query_id): r for r in
           quantize.pq_recall_report(df, queries, k=5,
                                     kc_values=(2, 4), m=4).collect()}
    assert len(got) == 4  # 2 kcs x 2 queries, spine-complete

    import struct as _s

    def f32(x):
        return _s.unpack("f", _s.pack("f", x))[0]

    vecs = {i: [f32(x) for x in v] for i, v in rows}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def l2(a, b):
        return dot(a, a) - 2.0 * dot(a, b) + dot(b, b)

    for qid in (0, 1):
        exact = {v for _, v in sorted(
            ((l2(vec, vecs[qid]), v) for v, vec in vecs.items()))[:5]}
        for kc in (2, 4):
            cb = quantize.pq_codebooks(df, m=4, k=kc)
            adc = {r.vec_id for r in
                   quantize.pq_adc_topk(
                       queries.where(F.col("query_id") == qid), cb,
                       quantize.pq_encode(df, cb), k=5).collect()}
            r = got[(kc, qid)]
            assert r.n_hits == len(exact & adc), (kc, qid)
            assert r.recall_pct == r.n_hits * 100 // 5
            assert 0 <= r.n_hits <= 5


def test_ivfpq_anchor_and_pruning(spark):
    """X58: at nprobe = n_centroids IVF-PQ probes every bucket and
    equals plain ADC over the full codes (the exact-anchor
    equivalence, q138's convention); at nprobe < C every returned
    neighbor's bucket is one the query probed — the pruning is real
    and honored."""
    import math

    from real_time_iot_data_pipeline_project_spark.operators.similarity import (
        assign_centroids, cosine, sampled_centroids,
    )

    rows = [(i, [float(math.cos(i * 3 + j)) for j in range(8)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = (df.where(F.col("vec_id").isin(0, 1))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qvec")))
    full = quantize.ivfpq_topk(df, queries, n_centroids=4, nprobe=4,
                               m=4, kc=3, k=5)
    cb = quantize.pq_codebooks(df, m=4, k=3)
    plain = quantize.pq_adc_topk(queries, cb,
                                 quantize.pq_encode(df, cb), k=5)
    assert sorted(map(tuple, full.collect())) \
        == sorted(map(tuple, plain.collect()))

    pruned = quantize.ivfpq_topk(df, queries, n_centroids=4, nprobe=1,
                                 m=4, kc=3, k=5).collect()
    cents = sampled_centroids(df, 4)
    assigned = {r.vec_id: r.centroid_id for r in
                assign_centroids(df, cents).collect()}
    qvec_d = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    cvec_d = F.transform(F.col("cvec"), lambda x: x.cast("double"))
    best = {r.query_id: r.centroid_id for r in
            queries.crossJoin(F.broadcast(cents))
            .select("query_id", "centroid_id",
                    cosine(qvec_d, cvec_d).alias("s"))
            .groupBy("query_id")
            .agg(F.expr("max_by(centroid_id, struct(s, -centroid_id))")
                 .alias("centroid_id")).collect()}
    assert pruned
    for r in pruned:
        assert assigned[r.vec_id] == best[r.query_id]


def test_ivfpq_residual_adc_is_distance_to_reconstruction(spark):
    """X61: residual ADC(q, v) equals the exact l2² between q and v's
    RECONSTRUCTION c(v) + codewords(residual) — per-subspace l2² terms
    are additive over the concatenation, and the LUT row used is the
    query's residual against v's OWN centroid (probe-restriction
    machinery is q155's, pinned by its pruning test)."""
    import math

    from real_time_iot_data_pipeline_project_spark.operators.similarity import (
        assign_centroids, sampled_centroids,
    )

    rows = [(i, [float(math.sin(i * 3 + j) + (i % 4))
                 for j in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = (df.where(F.col("vec_id").isin(0, 1))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qvec")))
    got = quantize.ivfpq_residual_topk(df, queries, n_centroids=4,
                                       nprobe=4, m=4, kc=3, k=5).collect()
    assert got

    import struct as _s

    def f32(x):
        return _s.unpack("f", _s.pack("f", x))[0]

    vecs = {i: [f32(x) for x in v] for i, v in rows}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def l2(a, b):
        return dot(a, a) - 2.0 * dot(a, b) + dot(b, b)

    cents = sampled_centroids(df, 4)
    cvecs = {r.centroid_id: [f32(x) for x in r.cvec]
             for r in cents.collect()}
    assigned = {r.vec_id: r.centroid_id
                for r in assign_centroids(df, cents).collect()}
    res = {i: [x - y for x, y in zip(vecs[i], cvecs[assigned[i]])]
           for i in vecs}
    rdf = spark.createDataFrame(
        [(i, r) for i, r in res.items()],
        "vec_id long, rvec array<double>")
    cb = quantize.pq_codebooks(rdf, m=4, k=3, vec_col="rvec")
    codes = {(r.vec_id, r.sub_id): r.code
             for r in quantize.pq_encode(rdf, cb, vec_col="rvec")
             .collect()}
    cbooks = {(r.sub_id, r.code_id): [float(x) for x in r.cvec]
              for r in cb.collect()}
    for r in got:
        recon = list(cvecs[assigned[r.vec_id]])
        for j in range(4):
            cw = cbooks[(j, codes[(r.vec_id, j)])]
            for t in range(2):
                recon[j * 2 + t] += cw[t]
        qv = vecs[r.query_id]
        assert r.adc_dist == pytest.approx(l2(qv, recon), abs=1e-5), \
            (r.query_id, r.vec_id)


# ------------------------------------------------------------ corpus stats

def test_corpus_token_stats_uniform_entropy(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id long, text string"
    )
    r = textops.corpus_token_stats(df).collect()[0]
    assert (r.total_tokens, r.vocab_size) == (4, 4)
    assert r.type_token_ratio == 1.0 and r.singleton_frac == 1.0
    assert r.entropy_bits == pytest.approx(2.0, abs=1e-6)


def test_corpus_token_stats_skewed(spark):
    df = spark.createDataFrame([(1, "a a a b")], "doc_id long, text string")
    r = textops.corpus_token_stats(df).collect()[0]
    expect = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert r.entropy_bits == pytest.approx(expect, abs=1e-6)
    assert r.singleton_frac == 0.5


# ------------------------------------------------------- epoch shuffle

def test_epoch_shuffle_deterministic_and_complete(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = sampling.epoch_shuffle(df, "doc_id", epoch=1, n_shards=8).collect()
    b = sampling.epoch_shuffle(df, "doc_id", epoch=1, n_shards=8).collect()
    assert sorted((r.doc_id, r.shard, r.pos) for r in a) == \
           sorted((r.doc_id, r.shard, r.pos) for r in b)  # same epoch replays
    assert len(a) == 500 and len({r.doc_id for r in a}) == 500  # permutation
    # pos is 1..n contiguous within each shard
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_epoch_shuffle_changes_between_epochs(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    e1 = {(r.doc_id, r.shard, r.pos)
          for r in sampling.epoch_shuffle(df, "doc_id", 1, n_shards=8).collect()}
    e2 = {(r.doc_id, r.shard, r.pos)
          for r in sampling.epoch_shuffle(df, "doc_id", 2, n_shards=8).collect()}
    assert len(e1 & e2) < len(e1) // 2  # epochs genuinely reshuffle


# ------------------------------------------------------ source leakage

def test_source_overlap_matrix_planted(spark):
    shared = " ".join(f"s{i}" for i in range(8))
    only_a = " ".join(f"a{i}" for i in range(8))
    only_c = " ".join(f"c{i}" for i in range(8))
    df = spark.createDataFrame(
        [
            (1, "A", f"{shared} {only_a}"),
            (2, "B", shared),
            (3, "C", only_c),
            (4, "B", shared),  # duplicate within B must not double-count
        ],
        "doc_id long, source string, text string",
    )
    out = {(r.src_a, r.src_b): r.n_shared_chunks
           for r in dedup.source_overlap_matrix(df).collect()}
    assert out == {("A", "B"): 1}


# --------------------------------------------------- unigram logprob

def test_unigram_logprob_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a"), (2, "a b")], "doc_id long, text string"
    )
    # corpus: a×3, b×1, T=4 → p(a)=0.75, p(b)=0.25
    out = {r.doc_id: r for r in textops.unigram_logprob_scores(df).collect()}
    assert out[1].n_tok == 2
    assert out[1].bits_per_token == pytest.approx(-math.log2(0.75), abs=1e-6)
    assert out[2].bits_per_token == pytest.approx(
        (-math.log2(0.75) - math.log2(0.25)) / 2, abs=1e-6
    )
    # rarer-token doc scores strictly higher (the filter's ordering)
    assert out[2].bits_per_token > out[1].bits_per_token


# ---------------------------------------------------- context windows

def test_split_documents_windows_and_overlap(spark):
    toks = [f"t{i}" for i in range(100)]
    df = spark.createDataFrame([(1, " ".join(toks)), (2, "a b c")],
                               "doc_id long, text string")
    out = packing.split_documents(df, window_tokens=64, stride=48).collect()
    d1 = sorted((r.win_idx, r.n_win_tokens) for r in out if r.doc_id == 1)
    # n=100: windows at 0..63 and 48..99 -> sizes 64 and 52
    assert d1 == [(0, 64), (1, 52)]
    w1 = {r.win_idx: r.window_fp for r in out if r.doc_id == 1}
    assert w1[0] == hashlib.md5(" ".join(toks[0:64]).encode()).hexdigest()
    assert w1[1] == hashlib.md5(" ".join(toks[48:100]).encode()).hexdigest()
    # short doc: exactly one whole-doc window
    d2 = [r for r in out if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].n_win_tokens == 3


def test_split_documents_full_coverage_property(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(n)))
         for i, n in enumerate([1, 48, 64, 65, 112, 113, 300])],
        "doc_id long, text string",
    )
    out = packing.split_documents(df, window_tokens=64, stride=48).collect()
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    lengths = [1, 48, 64, 65, 112, 113, 300]
    for i, n in enumerate(lengths):
        rows = per_doc[i]
        expect_nw = 1 if n <= 64 else math.ceil((n - 64) / 48) + 1
        assert len(rows) == expect_nw, (n, len(rows))
        # last window reaches the final token
        last = max(rows, key=lambda r: r.win_idx)
        assert (last.win_idx * 48) + last.n_win_tokens == n


# ------------------------------------------------------------ curate CLI

def test_curate_corpus_cli_pipeline(spark, tmp_path):
    from real_time_iot_data_pipeline_project_spark import pipelines
    from real_time_iot_data_pipeline_project_spark.operators import dedup as dd

    src = "/root/testdata/sf0.001/documents.parquet"
    out_dir = str(tmp_path / "curated")
    final = pipelines.curate_corpus(spark, src, out_dir)
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == final.count() and len(rows) > 0
    # every surviving row satisfies the gate
    assert all(r.q >= 0.45 and r.detected_lang == "en" for r in rows)
    # survivors are a subset of the exact-dedup winners
    docs = spark.read.parquet(src)
    winners = {r.doc_id for r in dd.exact_dedup(docs).select("doc_id").collect()}
    assert {r.doc_id for r in rows} <= winners
    # partitioned layout by detected language
    assert (tmp_path / "curated" / "detected_lang=en").exists()


# ------------------------------------------------------------ input guards

def test_operator_input_guards(spark):
    df = spark.createDataFrame([(1, "en", "a b")], "k long, lang string, text string")
    with pytest.raises(ValueError, match="weights"):
        sampling.upsample_by_weight(df, "k", "lang", {"en": -0.5})
    with pytest.raises(ValueError, match="buckets"):
        sampling.shard_assign(df, "k", 0)
    with pytest.raises(ValueError, match="capacity"):
        packing.pack_sequences(
            df.withColumn("shard", F.lit(0)).withColumn("n_tok", F.lit(1)),
            tokens_col="n_tok", capacity=0,
        )
    with pytest.raises(ValueError, match="stride"):
        packing.split_documents(df, window_tokens=8, stride=9)
    with pytest.raises(ValueError, match="chunk_tokens"):
        dedup.chunk_dedup(df.withColumnRenamed("k", "doc_id"), chunk_tokens=0)


# ------------------------------------------------- incremental dedup

def test_dedup_against_semantics(spark):
    base = spark.createDataFrame(
        [(1, "alpha beta"), (3, "gamma delta")], "doc_id long, text string"
    )
    inc = spark.createDataFrame(
        [
            (10, "alpha  BETA "),   # normalizes to base doc 1 -> dropped
            (11, "fresh text one"),
            (12, "fresh text two"),
            (13, "fresh text one"),  # within-increment dup -> min id 11 wins
        ],
        "doc_id long, text string",
    )
    out = sorted(r.doc_id for r in dedup.dedup_against(inc, base).collect())
    assert out == [11, 12]


# --------------------------------------------------------- SQL surface

def test_attach_views_sql_surface(spark):
    from real_time_iot_data_pipeline_project_spark import registry

    registry.attach_views(spark, "/root/testdata/sf0.001")
    n = spark.sql("SELECT count(*) AS n FROM q48_training_data_pipeline").collect()[0].n
    assert n > 0
    joined = spark.sql("""
        SELECT d.source, f.n_final
        FROM q69_curation_funnel f JOIN documents d ON d.source = f.source
        LIMIT 5
    """).collect()
    assert len(joined) == 5


# ------------------------------------------- packing property (hypothesis)

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=40),
       st.integers(min_value=16, max_value=160))
def test_pack_sequences_property(spark, tokens, cap):
    rows = [(0, i, t) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, "shard long, doc_id long, n_tok long")
    got = {r.doc_id: r.bin_id
           for r in packing.pack_sequences(df, tokens_col="n_tok",
                                           capacity=cap).collect()}
    assert [got[i] for i in range(len(tokens))] == _greedy(tokens, cap)


# ------------------------------------------------------ train/val/test

def test_assign_split_stable_under_growth(spark):
    df1 = spark.range(0, 300).withColumnRenamed("id", "k")
    df2 = spark.range(0, 600).withColumnRenamed("id", "k")  # corpus grew
    s1 = {r.k: r.split for r in sampling.assign_split(df1, "k").collect()}
    s2 = {r.k: r.split for r in sampling.assign_split(df2, "k").collect()}
    assert all(s2[k] == v for k, v in s1.items())  # no migration on growth
    assert set(s2.values()) == {"train", "val", "test"}
    for k, v in s1.items():
        b = _bucket("split", k)
        assert v == ("test" if b < 5 else "val" if b < 10 else "train")
    with pytest.raises(ValueError, match="val_pct"):
        sampling.assign_split(df1, "k", val_pct=60, test_pct=50)


# ------------------------------------------------- langid confidence

def test_lang_confidence_margin(spark):
    df = spark.createDataFrame(
        [
            (1, "the of and the is that it the a for"),  # pure en -> big margin
            (2, "the der und of die das is la el"),      # code-mixed -> small
            (3, "zz qq ww"),                             # no stopwords -> 0
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.m
           for r in df.select("doc_id",
                              textfns.lang_confidence("text").alias("m")).collect()}
    assert out[1] > 0.5
    assert 0 <= out[2] < out[1]
    assert out[3] == 0.0


# ------------------------------------------------- leakage-safe splits (X36)

def test_leakage_safe_splits_planted_clusters(spark):
    """Hand-built graph: chain {1,2,3}, pair {5,6}, singletons 0/4/7.
    cluster_id = min member; split = the shared split rule over
    cluster_id (python-replicated); every cluster shares one split."""
    df = spark.createDataFrame([(i,) for i in range(8)], ["k"])
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"])
    out = {r.k: (r.cluster_id, r.split)
           for r in sampling.leakage_safe_splits(df, "k", edges).collect()}
    assert {k: c for k, (c, _) in out.items()} == {
        0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}
    for k, (c, s) in out.items():
        b = _bucket("split", c)
        assert s == ("test" if b < 5 else "val" if b < 10 else "train")
    with pytest.raises(ValueError, match="val_pct"):
        sampling.leakage_safe_splits(df, "k", edges, val_pct=60, test_pct=50)


def test_leakage_safe_splits_no_near_dup_pair_straddles(spark):
    """THE guarantee, on the real corpus + real LSH pairs (sf0.001):
    zero near-dup pairs straddle a split boundary — while the naive
    doc-keyed split demonstrably DOES straddle (so the operator is
    load-bearing, not vacuous). Every doc keeps exactly one row."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = dedup.minhash_lsh_candidates(docs).filter(F.col("est_jaccard") >= 0.75)
    safe = sampling.leakage_safe_splits(docs.select("doc_id"), "doc_id", pairs)

    def straddles(split_df):
        a = split_df.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
        b = split_df.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
        return pairs.join(a, "id_a").join(b, "id_b").filter("sa != sb").count()

    assert pairs.count() > 0
    assert straddles(safe) == 0
    naive = sampling.assign_split(docs.select("doc_id"), "doc_id")
    assert straddles(naive) > 0
    assert safe.count() == docs.count()
    assert safe.select("doc_id").distinct().count() == docs.count()


# ------------------------------------------------- temperature mixture (X37)

def _expected_temp_rates(counts: dict, alpha=0.7, budget_frac=0.5):
    """Python replica of temperature_mix_rates' exact arithmetic."""
    w = {s: round(float(n) ** alpha, 6) for s, n in counts.items()}
    wsum = float(sum(w.values()))  # 6-dp decimals sum exactly in float here
    n_total = sum(counts.values())
    out = {}
    for s, n in counts.items():
        raw = (((100.0 * budget_frac) * n_total) * (w[s] / wsum)) / n
        out[s] = min(100, int(raw + 0.5))  # HALF_UP like F.round
    return out


def test_temperature_mix_rates_hand_computed(spark):
    rows = [(f"d{s}{i}", s) for s, n in [("a", 160), ("b", 30), ("c", 10)]
            for i in range(n)]
    df = spark.createDataFrame(rows, ["k", "src"])
    got = {r.src: (r.n, r.rate_pct)
           for r in sampling.temperature_mix_rates(df, "src").collect()}
    exp = _expected_temp_rates({"a": 160, "b": 30, "c": 10})
    assert {s: r for s, (_, r) in got.items()} == exp
    assert {s: n for s, (n, _) in got.items()} == {"a": 160, "b": 30, "c": 10}
    # alpha < 1 flattens: rare strata sample at a HIGHER per-row rate
    assert got["c"][1] > got["b"][1] > got["a"][1]


def test_temperature_alpha_one_is_uniform(spark):
    """alpha=1 ⇒ share ∝ n ⇒ every stratum keeps exactly budget_frac."""
    rows = [(f"d{s}{i}", s) for s, n in [("a", 123), ("b", 7)] for i in range(n)]
    df = spark.createDataFrame(rows, ["k", "src"])
    rates = sampling.temperature_mix_rates(df, "src", alpha=1.0, budget_frac=0.4)
    assert {r.src: r.rate_pct for r in rates.collect()} == {"a": 40, "b": 40}


def test_temperature_sample_membership_exact(spark):
    rows = [(f"d{s}{i}", s) for s, n in [("a", 160), ("b", 30), ("c", 10)]
            for i in range(n)]
    df = spark.createDataFrame(rows, ["k", "src"])
    exp_rates = _expected_temp_rates({"a": 160, "b": 30, "c": 10})
    kept = {r.k for r in sampling.temperature_sample(df, "k", "src").collect()}
    for k, s in rows:
        assert (k in kept) == (_bucket("tmix", k) < exp_rates[s]), (k, s)
    with pytest.raises(ValueError, match="budget_frac"):
        sampling.temperature_mix_rates(df, "src", budget_frac=0.0)
    with pytest.raises(ValueError, match="alpha"):
        sampling.temperature_mix_rates(df, "src", alpha=-1.0)


def test_temperature_sample_keeps_null_stratum_rows(spark):
    """A NULL stratum is a group like any other (rates has a row for
    it); the join-back is null-SAFE, so null-stratum rows sample at
    their group's rate instead of silently vanishing."""
    rows = [(f"a{i}", "a") for i in range(40)] + [(f"n{i}", None) for i in range(40)]
    df = spark.createDataFrame(rows, ["k", "src"])
    rates = {r.src: r.rate_pct
             for r in sampling.temperature_mix_rates(df, "src").collect()}
    assert None in rates and rates[None] == rates["a"]  # equal-sized groups
    kept = {r.k for r in sampling.temperature_sample(df, "k", "src").collect()}
    for k, s in rows:
        assert (k in kept) == (_bucket("tmix", k) < rates[s]), (k, s)
    assert any(k.startswith("n") for k in kept)


def test_mixture_waterfill_caps_and_redistributes(spark):
    """X44 hand case: a starved heavy-weight stratum caps at capacity
    and its excess fair share redistributes over the rest — the
    fixpoint a one-shot per-source cap never reaches."""
    from real_time_iot_data_pipeline_project_spark.operators import sampling

    df = spark.createDataFrame(
        [("a", 100), ("b", 1000), ("c", 1000)], "s string, n int")
    w = (F.when(F.col("s") == "a", 50)
         .when(F.col("s") == "b", 25).otherwise(25))
    got = {r.s: (r.capped, r.allocation_tokens) for r in
           sampling.mixture_waterfill(df, "s", w, 1200,
                                      tokens_col="n").collect()}
    # fair shares at B=1200: a=600 > 100 -> capped; residual 1100
    # splits 25:25 over b and c
    assert got == {"a": (1, 100), "b": (0, 550), "c": (0, 550)}


def test_mixture_waterfill_infeasible_and_degenerate(spark):
    """Budget beyond total capacity caps everything at capacity;
    budget 0 allocates nothing; a weight-0 stratum never receives."""
    from real_time_iot_data_pipeline_project_spark.operators import sampling

    df = spark.createDataFrame(
        [("a", 100), ("b", 1000), ("c", 1000)], "s string, n int")
    w = (F.when(F.col("s") == "a", 50)
         .when(F.col("s") == "b", 25).otherwise(25))
    allcap = {r.s: (r.capped, r.allocation_tokens) for r in
              sampling.mixture_waterfill(df, "s", w, 99999,
                                         tokens_col="n").collect()}
    assert allcap == {"a": (1, 100), "b": (1, 1000), "c": (1, 1000)}

    zero = {r.s: r.allocation_tokens for r in
            sampling.mixture_waterfill(df, "s", w, 0,
                                       tokens_col="n").collect()}
    assert zero == {"a": 0, "b": 0, "c": 0}

    w0 = F.when(F.col("s") == "a", 0).otherwise(1)
    nw = {r.s: (r.capped, r.allocation_tokens) for r in
          sampling.mixture_waterfill(df, "s", w0, 1200,
                                     tokens_col="n").collect()}
    assert nw == {"a": (0, 0), "b": (0, 600), "c": (0, 600)}

    # regression: a weight-0 stratum while EVERY weighted stratum caps
    # (budget beyond their combined capacity) must still get 0 — its
    # vacuous 0 <= 0 cap test once granted it full capacity here
    nw2 = {r.s: (r.capped, r.allocation_tokens) for r in
           sampling.mixture_waterfill(df, "s", w0, 99999,
                                      tokens_col="n").collect()}
    assert nw2 == {"a": (0, 0), "b": (1, 1000), "c": (1, 1000)}


def test_mixture_waterfill_conservation_property(spark):
    """For any feasible budget: allocations never exceed capacity,
    sum(alloc) <= B, and the flooring shortfall is < #uncapped —
    checked across a budget sweep on skewed capacities."""
    from real_time_iot_data_pipeline_project_spark.operators import sampling

    rows = [("s%d" % i, (i * 37) % 900 + 10) for i in range(9)]
    df = spark.createDataFrame(rows, "s string, n int")
    total = sum(n for _, n in rows)
    w = F.length("s") * 3 + F.ascii(F.substring("s", 2, 1))
    for b in (0, 1, total // 10, total // 2, total - 1, total):
        out = sampling.mixture_waterfill(df, "s", w, b,
                                         tokens_col="n").collect()
        caps = dict(rows)
        assert all(r.allocation_tokens <= caps[r.s] for r in out)
        alloc = sum(r.allocation_tokens for r in out)
        n_uncapped = sum(1 for r in out if r.capped == 0)
        assert alloc <= b
        assert b - alloc < max(n_uncapped, 1), (b, alloc, n_uncapped)


def test_waterfill_sample_greedy_maximal_and_monotone(spark):
    """X44 consumer: per stratum the kept set is the maximal hash-order
    prefix within the allocation (adding the next doc in hash order
    would exceed it), and a larger budget's kept set CONTAINS a smaller
    budget's (prefixes nest — mix growth without churn)."""
    from real_time_iot_data_pipeline_project_spark.functions import textfns
    from real_time_iot_data_pipeline_project_spark.operators import sampling

    rows = [("s%d" % (i % 3), i, (i * 29) % 40 + 5) for i in range(30)]
    df = spark.createDataFrame(rows, "src string, doc_id long, n int")
    w = F.lit(1)

    def kept(budget):
        out = sampling.waterfill_sample(df, "src", "doc_id", w, budget,
                                        tokens_col="n")
        return {r.doc_id: r for r in out.collect()}

    small, big = kept(120), kept(300)
    assert set(small) <= set(big) and len(small) > 0

    # greedy maximality: replay the rule in python per stratum
    import hashlib

    def h60(d):
        s = f"wfill|{d}".encode()
        return int(hashlib.md5(s).hexdigest()[:15], 16)

    allocs = {r.src: r.allocation_tokens for r in
              sampling.mixture_waterfill(df, "src", w, 300,
                                         tokens_col="n").collect()}
    by_src: dict[str, list] = {}
    for src, d, n in rows:
        by_src.setdefault(src, []).append((h60(d), d, n))
    expect = {}
    for src, docs in by_src.items():
        cum = 0
        for _, d, n in sorted(docs):
            if cum + n > allocs[src]:
                break
            cum += n
            expect[d] = (src, n, cum)
    assert {d: (r.source if hasattr(r, "source") else r.src,
                r.n_tok, r.cum_tokens)
            for d, r in big.items()} == expect


def test_waterfill_sample_prethin_equals_unthinned(spark):
    """VERDICT r11 item 5: the rate-based pre-thin (drop rows above the
    (1+margin)*allocation/capacity hash percentile BEFORE the
    per-stratum cumsum window) must leave the kept set IDENTICAL to
    the unthinned rule — on the synthetic frame across budgets and on
    the q139-shaped documents invocation."""
    from real_time_iot_data_pipeline_project_spark.functions import textfns
    from real_time_iot_data_pipeline_project_spark.operators import sampling

    # enough rows per stratum that the greedy boundary's hash
    # percentile concentrates near allocation/capacity — at tiny row
    # counts the conservative shortfall check fires by design
    rows = [("s%d" % (i % 3), i, (i * 29) % 40 + 5) for i in range(600)]
    df = spark.createDataFrame(rows, "src string, doc_id long, n int")
    w = F.lit(1)
    total = sum(n for _, _, n in rows)
    for budget in (total // 10, total // 3, total // 2):
        base = sampling.waterfill_sample(
            df, "src", "doc_id", w, budget, tokens_col="n")
        thin = sampling.waterfill_sample(
            df, "src", "doc_id", w, budget, tokens_col="n",
            prethin_margin=0.5)
        assert sorted(map(tuple, base.collect())) \
            == sorted(map(tuple, thin.collect())), budget

    # the gated q139 shape on the real documents table
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    total = int(docs.agg(
        F.sum(textfns.token_count("text")).cast("long")).head()[0])
    wq = (F.when(F.col("source") == "src0", 50)
          .when(F.col("source") == "src1", 30).otherwise(1))
    budget = total * 2 // 5
    base = sampling.waterfill_sample(docs, "source", "doc_id", wq, budget)
    thin = sampling.waterfill_sample(docs, "source", "doc_id", wq, budget,
                                     prethin_margin=0.5)
    assert sorted(map(tuple, base.collect())) \
        == sorted(map(tuple, thin.collect()))


def test_waterfill_sample_prethin_shortfall_raises(spark):
    """The pre-thin never silently undershoots: when a thinned
    stratum's survivors are all kept (the greedy boundary may lie
    beyond the hash cutoff — here zero-token rows ahead of one
    max-hash heavy row), the operator raises instead of returning a
    sample that differs from the unthinned rule."""
    import hashlib

    import pytest

    from real_time_iot_data_pipeline_project_spark.operators import sampling

    def h60(d):
        return int(hashlib.md5(f"wfill|{d}".encode()).hexdigest()[:15], 16)

    ids = list(range(40))
    heavy = max(ids, key=h60)  # all token mass at the TOP of hash order
    rows = [("s", i, 100 if i == heavy else 0) for i in ids]
    df = spark.createDataFrame(rows, "src string, doc_id long, n int")
    # unthinned keeps every zero-token row below the heavy row; the
    # 10%-rate pre-thin would drop most of them
    with pytest.raises(RuntimeError, match="pre-thin shortfall"):
        sampling.waterfill_sample(df, "src", "doc_id", F.lit(1), 10,
                                  tokens_col="n", prethin_margin=0.0)
    with pytest.raises(ValueError, match="prethin_margin"):
        sampling.waterfill_sample(df, "src", "doc_id", F.lit(1), 10,
                                  tokens_col="n", prethin_margin=-0.1)


def test_mixture_waterfill_preserves_null_stratum(spark):
    """Review catch: a NULL stratum once vanished through the
    null-hostile triangle-join predicate while its weight still
    inflated total_w, distorting every allocation. It must participate
    like any other stratum (the temperature_sample null convention),
    and waterfill_sample must route its docs through the null-safe
    alloc join."""
    from real_time_iot_data_pipeline_project_spark.operators import sampling

    df = spark.createDataFrame(
        [(None, 1, 50), (None, 2, 100), ("b", 3, 200)],
        "s string, doc_id long, n int")
    out = {r.s: (r.capped, r.allocation_tokens) for r in
           sampling.mixture_waterfill(df, "s", F.lit(1), 200,
                                      tokens_col="n").collect()}
    assert out == {None: (0, 100), "b": (0, 100)}
    kept = {(r.s, r.doc_id) for r in
            sampling.waterfill_sample(df, "s", "doc_id", F.lit(1), 200,
                                      tokens_col="n").collect()}
    # null stratum: doc hash order decides which of 1/2 fits in 100
    assert any(s is None for s, _ in kept)


def test_epoch_plan_three_regimes(spark):
    """X48 hand case: with a 2-epoch ceiling, a starved heavy stratum
    caps at E*C (all passes taken, remainder 0), and after
    redistribution the others land mid-pass (epochs_full 0 or 1 with a
    remainder) — the three regimes of a multi-epoch recipe."""
    from real_time_iot_data_pipeline_project_spark.operators import sampling

    df = spark.createDataFrame(
        [("a", 100), ("b", 1000), ("c", 1000)], "s string, n int")
    w = (F.when(F.col("s") == "a", 50)
         .when(F.col("s") == "b", 25).otherwise(25))
    got = {r.s: (r.capped, r.allocation_tokens, r.epochs_full,
                 r.remainder_tokens, r.capacity_tokens, r.max_epochs)
           for r in sampling.epoch_plan(df, "s", w, 1200, max_epochs=2,
                                        tokens_col="n").collect()}
    # a's fair share 600 > 2*100 -> ceiling; residual 1000 splits 25:25
    assert got == {"a": (1, 200, 2, 0, 100, 2),
                   "b": (0, 500, 0, 500, 1000, 2),
                   "c": (0, 500, 0, 500, 1000, 2)}

    # larger budget: b and c cross into full-pass-plus-partial
    got2 = {r.s: (r.capped, r.allocation_tokens, r.epochs_full,
                  r.remainder_tokens)
            for r in sampling.epoch_plan(df, "s", w, 2600, max_epochs=2,
                                         tokens_col="n").collect()}
    assert got2 == {"a": (1, 200, 2, 0),
                    "b": (0, 1200, 1, 200),
                    "c": (0, 1200, 1, 200)}

    with pytest.raises(ValueError, match="max_epochs"):
        sampling.epoch_plan(df, "s", w, 100, max_epochs=0,
                            tokens_col="n")


def test_epoch_plan_max_epochs_one_is_waterfill(spark):
    """The reduction is exact: max_epochs=1 must reproduce
    mixture_waterfill's plan verbatim (same capped flags and
    allocations), with epochs_full/remainder just the DIV/MOD view of
    the allocation."""
    from real_time_iot_data_pipeline_project_spark.operators import sampling

    df = spark.createDataFrame(
        [("a", 100), ("b", 1000), ("c", 1000)], "s string, n int")
    w = (F.when(F.col("s") == "a", 50)
         .when(F.col("s") == "b", 25).otherwise(25))
    wf = {r.s: (r.capped, r.allocation_tokens, r.capacity_tokens)
          for r in sampling.mixture_waterfill(df, "s", w, 1200,
                                              tokens_col="n").collect()}
    ep = sampling.epoch_plan(df, "s", w, 1200, max_epochs=1,
                             tokens_col="n").collect()
    assert {r.s: (r.capped, r.allocation_tokens, r.capacity_tokens)
            for r in ep} == wf
    for r in ep:
        assert r.epochs_full == r.allocation_tokens // r.capacity_tokens
        assert r.remainder_tokens == r.allocation_tokens % r.capacity_tokens


def test_epoch_expand_replication_and_partial_prefix(spark):
    """X48 consumer: every doc of a stratum appears exactly once per
    full epoch 0..epochs_full-1, and the partial epoch is the maximal
    greedy hash prefix of the remainder under the PER-EPOCH salt
    (epoch|epochs_full|key — an independent permutation, not epoch 0's
    order replayed; replayed in python to pin the exact rule)."""
    from real_time_iot_data_pipeline_project_spark.operators import sampling

    rows = [("s%d" % (i % 3), i, (i * 29) % 40 + 5) for i in range(30)]
    df = spark.createDataFrame(rows, "src string, doc_id long, n int")
    w = F.lit(1)
    budget = 900
    out = sampling.epoch_expand(df, "src", "doc_id", w, budget,
                                max_epochs=3, tokens_col="n").collect()
    plan = {r.src: r for r in
            sampling.epoch_plan(df, "src", w, budget, max_epochs=3,
                                tokens_col="n").collect()}

    def h60(salt, d):
        return int(hashlib.md5(f"{salt}|{d}".encode())
                   .hexdigest()[:15], 16)

    by_src: dict[str, list] = {}
    for src, d, n in rows:
        by_src.setdefault(src, []).append((d, n))
    expect = set()
    for src, docs in by_src.items():
        p = plan[src]
        for d, _n in docs:
            for e in range(p.epochs_full):
                expect.add((src, d, e))
        cum = 0
        sub = f"epoch|{p.epochs_full}"
        for _, d, n in sorted((h60(sub, d), d, n) for d, n in docs):
            if cum + n > p.remainder_tokens:
                break
            cum += n
            expect.add((src, d, p.epochs_full))
    assert {(r.src, r.doc_id, r.epoch) for r in out} == expect
    assert len(out) == len(expect)  # exact replication, no dup rows
    # at least one stratum exercised each regime
    efs = {p.epochs_full for p in plan.values()}
    assert any(p.remainder_tokens > 0 for p in plan.values())
    assert max(efs) >= 1


def test_epoch_expand_delivers_budget(spark):
    """Token accounting: the expansion's total token mass equals
    sum(epochs_full*C + partial) per stratum, within one doc per
    stratum of the plan's allocations, and never exceeds them."""
    from real_time_iot_data_pipeline_project_spark.operators import sampling

    rows = [("s%d" % (i % 4), i, (i * 13) % 30 + 3) for i in range(40)]
    df = spark.createDataFrame(rows, "src string, doc_id long, n int")
    plan = {r.src: r for r in
            sampling.epoch_plan(df, "src", F.lit(1), 500, max_epochs=4,
                                tokens_col="n").collect()}
    got = sampling.epoch_expand(df, "src", "doc_id", F.lit(1), 500,
                                max_epochs=4, tokens_col="n").collect()
    per_src: dict[str, int] = {}
    for r in got:
        per_src[r.src] = per_src.get(r.src, 0) + r.n_tok
    max_doc = {src: max(n for s, _, n in rows if s == src)
               for src in plan}
    for src, p in plan.items():
        delivered = per_src.get(src, 0)
        assert delivered <= p.allocation_tokens
        assert p.allocation_tokens - delivered <= max_doc[src]


def test_epoch_expand_prethin_equals_unthinned(spark):
    """VERDICT r12 item 2: the partial pass's rate-based pre-thin
    (waterfill_sample's fast path threaded through epoch_expand) must
    leave the expanded (doc, epoch) set IDENTICAL to the unthinned
    rule — on the synthetic frame across budgets and on the
    q144-shaped documents invocation."""
    from real_time_iot_data_pipeline_project_spark.functions import textfns
    from real_time_iot_data_pipeline_project_spark.operators import sampling

    rows = [("s%d" % (i % 3), i, (i * 29) % 40 + 5) for i in range(600)]
    df = spark.createDataFrame(rows, "src string, doc_id long, n int")
    total = sum(n for _, _, n in rows)
    for budget in (total // 2, total, total * 2):
        base = sampling.epoch_expand(df, "src", "doc_id", F.lit(1),
                                     budget, max_epochs=3,
                                     tokens_col="n")
        thin = sampling.epoch_expand(df, "src", "doc_id", F.lit(1),
                                     budget, max_epochs=3,
                                     tokens_col="n",
                                     prethin_margin=0.5)
        assert sorted(map(tuple, base.collect())) \
            == sorted(map(tuple, thin.collect())), budget

    # the gated q144 shape on the real documents table
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    total = int(docs.agg(
        F.sum(textfns.token_count("text")).cast("long")).head()[0])
    wq = (F.when(F.col("source") == "src0", 80)
          .when(F.col("source") == "src1", 30).otherwise(1))
    budget = total * 2 // 5
    # margin 3.0, not the production 0.5: sf0.001's weight-1 sources
    # have few docs, so the survivor mass of a 1.5x-rate cut sits
    # within the guard's conservative band and raises (by design —
    # the guard is variance-aware via refusal, not estimation); a 4x
    # rate clears it while still exercising thinning on every
    # remainder>0 stratum
    base = sampling.epoch_expand(docs, "source", "doc_id", wq, budget,
                                 max_epochs=4)
    thin = sampling.epoch_expand(docs, "source", "doc_id", wq, budget,
                                 max_epochs=4, prethin_margin=3.0)
    assert sorted(map(tuple, base.collect())) \
        == sorted(map(tuple, thin.collect()))


def test_epoch_expand_prethin_shortfall_raises(spark):
    """The partial-pass pre-thin never silently undershoots: when a
    thinned stratum's survivors all fit inside the remainder (the
    greedy boundary may lie beyond the hash cutoff — here zero-token
    rows ahead of one max-hash heavy row, the waterfill_sample guard
    case at epoch tier), the operator raises instead of diverging
    from the unthinned rule.  Full passes are unaffected by the
    margin (no window)."""
    import hashlib as _hl

    from real_time_iot_data_pipeline_project_spark.operators import sampling

    # single stratum, max_epochs=1: capacity 100+39*0=100... use
    # tokens so remainder>0: budget 10 of capacity 100 -> epochs_full
    # 0, remainder 10.  Heavy doc at the TOP of the partial-pass hash
    # order (salt epoch|0|key): unthinned keeps every zero-token row
    # below it; a 10%-rate pre-thin drops most of them.
    def h60(d):
        return int(_hl.md5(f"epoch|0|{d}".encode()).hexdigest()[:15], 16)

    ids = list(range(40))
    heavy = max(ids, key=h60)
    rows = [("s", i, 100 if i == heavy else 0) for i in ids]
    df = spark.createDataFrame(rows, "src string, doc_id long, n int")
    with pytest.raises(RuntimeError, match="pre-thin shortfall"):
        sampling.epoch_expand(df, "src", "doc_id", F.lit(1), 10,
                              max_epochs=1, tokens_col="n",
                              prethin_margin=0.0)
    with pytest.raises(ValueError, match="prethin_margin"):
        sampling.epoch_expand(df, "src", "doc_id", F.lit(1), 10,
                              max_epochs=1, tokens_col="n",
                              prethin_margin=-0.1)


def test_source_novelty_planted(spark):
    """X49 hand case: sources in lexicographic priority order — a's
    3-grams are all first-seen (novelty 100%); b repeats one of a's
    3-grams verbatim and adds one new (novelty 50%); c is pure
    repetition of a (novelty 0%); a doc shorter than n contributes
    nothing."""
    from real_time_iot_data_pipeline_project_spark.operators import textops

    df = spark.createDataFrame(
        [("a", 1, "alpha beta gamma delta"),     # grams: abc, bcd
         ("b", 2, "alpha beta gamma"),           # abc (repeat of a's)
         ("b", 3, "zeta eta theta"),             # new gram
         ("c", 4, "Alpha  Beta   GAMMA"),        # normalizes to abc
         ("c", 5, "too short")],                 # < 3 tokens: nothing
        "source string, doc_id long, text string")
    got = {r.source: (r.total_ngrams, r.distinct_ngrams,
                      r.novel_ngrams, r.novelty_bp)
           for r in textops.source_novelty(df, n=3).collect()}
    assert got == {"a": (2, 2, 2, 10000),
                   "b": (2, 2, 1, 5000),
                   "c": (1, 1, 0, 0)}

    with pytest.raises(ValueError, match="n must be positive"):
        textops.source_novelty(df, n=0)


def test_source_novelty_within_source_repeats_count_once(spark):
    """distinct_ngrams dedups WITHIN a source (a doc-internal or
    cross-doc repeat is one distinct gram), while total_ngrams counts
    occurrences — the distinct/total gap is the source's internal
    redundancy."""
    from real_time_iot_data_pipeline_project_spark.operators import textops

    df = spark.createDataFrame(
        [("a", 1, "x y z x y z x y z"),   # 7 windows, 3 distinct
         ("a", 2, "x y z")],              # 1 window, repeat
        "source string, doc_id long, text string")
    got = textops.source_novelty(df, n=3).collect()[0]
    assert (got.total_ngrams, got.distinct_ngrams,
            got.novel_ngrams) == (8, 3, 3)


def test_moore_lewis_hand_computed_and_direction(spark):
    """X51 hand case: pool {a:3, b:3, x:1} (tg=7), seed {a:2} (ti=2),
    shared vocab V=3, add-one smoothing.  The all-'a' doc must score
    NEGATIVE (seed likes it more than the pool does), the out-of-
    domain doc positive, and values match the closed form to the 6-dp
    rounding."""
    df = spark.createDataFrame(
        [(1, "a a", "in"), (2, "b b", "out"), (3, "a b x", "out")],
        "doc_id long, text string, source string")
    seed = df.where(F.col("source") == "in")  # tokens: a a
    out = {r.doc_id: r for r in
           textops.moore_lewis_scores(df, seed).collect()}

    tg, ti, v = 7, 2, 3  # pool total, seed total, union vocab

    def bits(cg, ci):
        return (math.log((cg + 1.0) / (tg + v))
                - math.log((ci + 1.0) / (ti + v))) / math.log(2.0)

    a, b, x = bits(3, 2), bits(3, 0), bits(1, 0)
    assert out[1].n_tok == 2
    assert out[1].ml_bits == pytest.approx(a, abs=1e-6)
    assert out[2].ml_bits == pytest.approx(b, abs=1e-6)
    assert out[3].ml_bits == pytest.approx((a + b + x) / 3, abs=1e-6)
    # direction: the in-domain doc ranks strictly first ascending
    assert out[1].ml_bits < 0 < out[2].ml_bits
    assert out[1].ml_bits < out[3].ml_bits < out[2].ml_bits


def test_moore_lewis_unseen_token_finite(spark):
    """A candidate token absent from the seed gets the Laplace floor,
    not -inf/NaN — and an in-domain-heavy doc still wins over a doc of
    pure unseen tokens."""
    df = spark.createDataFrame(
        [(1, "q w e r t y", "pool"), (2, "alpha alpha", "pool"),
         (3, "alpha beta alpha", "seedsrc")],
        "doc_id long, text string, source string")
    out = {r.doc_id: r for r in textops.moore_lewis_scores(
        df, df.where(F.col("source") == "seedsrc")).collect()}
    assert all(math.isfinite(r.ml_bits) for r in out.values())
    assert out[2].ml_bits < out[1].ml_bits


def test_epoch_plan_zero_capacity_stratum(spark):
    """A stratum whose every row carries 0 tokens (capacity 0) must
    plan 0 epochs / 0 remainder without tripping the DIV/MOD-by-zero
    guards, and the expansion must ship nothing for it."""
    from real_time_iot_data_pipeline_project_spark.operators import sampling

    df = spark.createDataFrame(
        [("z", 1, 0), ("z", 2, 0), ("b", 3, 100), ("b", 4, 100)],
        "s string, doc_id long, n int")
    got = {r.s: (r.capacity_tokens, r.allocation_tokens,
                 r.epochs_full, r.remainder_tokens)
           for r in sampling.epoch_plan(df, "s", F.lit(1), 300,
                                        max_epochs=2,
                                        tokens_col="n").collect()}
    assert got["z"] == (0, 0, 0, 0)
    assert got["b"][0] == 200
    out = sampling.epoch_expand(df, "s", "doc_id", F.lit(1), 300,
                                max_epochs=2, tokens_col="n").collect()
    assert all(r.s == "b" for r in out)


def test_waterfill_prethin_alloc_zero_stratum_not_thinned(spark):
    """Review catch: a stratum floored/weighted to allocation 0 once
    made the pre-thin guard raise unconditionally (rate 0 -> zero
    survivors -> 0 <= 0 shortfall, unfixable by any margin).  Such
    strata are now exempt from thinning and the kept set equals the
    unthinned rule exactly."""
    from real_time_iot_data_pipeline_project_spark.operators import sampling

    rows = ([("a", i, (i * 29) % 40 + 5) for i in range(30)]
            + [("zero", 100 + i, 10) for i in range(5)])
    df = spark.createDataFrame(rows, "src string, doc_id long, n int")
    w = F.when(F.col("src") == "zero", 0).otherwise(1)
    base = {(r.src, r.doc_id) for r in
            sampling.waterfill_sample(df, "src", "doc_id", w, 200,
                                      tokens_col="n").collect()}
    thin = {(r.src, r.doc_id) for r in
            sampling.waterfill_sample(df, "src", "doc_id", w, 200,
                                      tokens_col="n",
                                      prethin_margin=1.0).collect()}
    assert thin == base and base
    assert all(s != "zero" for s, _ in base)


def test_naive_bayes_hand_computed_and_separable(spark):
    """X53: on a planted separable vocabulary NB recovers every label
    (including docs mixing in shared noise tokens), the posterior
    matches the closed form to the 6-dp rounding, and an unseen token
    stays finite via the Laplace floor."""
    from real_time_iot_data_pipeline_project_spark.operators import classify

    train = spark.createDataFrame(
        [(1, "apfel apfel strasse", "de"), (2, "strasse apfel", "de"),
         (3, "pomme rue rue", "fr"), (4, "pomme pomme", "fr")],
        "doc_id long, text string, lang string")
    test = spark.createDataFrame(
        [(10, "apfel strasse zzz"),   # de vocab + unseen token
         (11, "rue pomme"),           # fr vocab
         (12, "zzz qqq")],            # all unseen -> prior/total fight
        "doc_id long, text string")
    counts = classify.nb_train(train, label_col="lang")
    dc = classify.nb_doc_counts(train, label_col="lang")
    got = {r.doc_id: r for r in
           classify.nb_classify(test, counts, dc).collect()}
    assert got[10].label == "de" and got[11].label == "fr"

    import math

    # closed form for doc 10 under label de: T_de=5, T_fr=5, V=4,
    # priors ln(3/6) both (2+1 docs / 4+2)
    def score(tokens, t, cnt):
        prior = math.log(3.0 / 6.0)
        return prior + sum(
            math.log((cnt.get(tok, 0) + 1.0) / (t + 4.0))
            for tok in tokens)
    de = score(["apfel", "strasse", "zzz"], 5,
               {"apfel": 3, "strasse": 2})
    fr = score(["apfel", "strasse", "zzz"], 5,
               {"pomme": 3, "rue": 2})
    assert got[10].score == pytest.approx(de, abs=1e-6)
    assert de > fr
    # all-unseen doc: finite score, deterministic (DESC-label) tie
    assert math.isfinite(got[12].score)
    assert got[12].label in ("de", "fr")


def test_naive_bayes_priors_break_vocab_ties(spark):
    """With identical class vocabularies the prior decides: the label
    with more training docs wins every prediction."""
    from real_time_iot_data_pipeline_project_spark.operators import classify

    train = spark.createDataFrame(
        [(i, "x y", "big") for i in range(8)]
        + [(100, "x y", "small")],
        "doc_id long, text string, lang string")
    test = spark.createDataFrame([(200, "x y x")],
                                 "doc_id long, text string")
    counts = classify.nb_train(train, label_col="lang")
    dc = classify.nb_doc_counts(train, label_col="lang")
    got = classify.nb_classify(test, counts, dc).collect()[0]
    assert got.label == "big"


def test_dsir_scores_match_python_replay(spark):
    """X56 hand case: dsir_logw equals a full python replication of
    the hashed-ngram importance weight — md5 bucketing (with a SMALL
    bucket space so collisions are exercised), add-one smoothed
    bucket multinomials, per-occurrence ln-ratio with the decimal
    pre-sum quantization — and n_feat counts unigrams + bigrams."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from real_time_iot_data_pipeline_project_spark.operators import textops

    rows = [(1, "apple pie recipe with apple"),
            (2, "stock market crash deepens"),
            (3, "apple pie"),
            (4, "market pie outlook")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seed = df.where(F.col("doc_id").isin(1, 3))
    B = 17  # tiny on purpose: forces real bucket collisions
    got = {r.doc_id: r for r in
           textops.dsir_scores(df, seed, n_buckets=B).collect()}

    def feats(text):
        t = text.lower().split()
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % B

    pool_counts: dict[int, int] = {}
    seed_counts: dict[int, int] = {}
    for i, tx in rows:
        for f in feats(tx):
            pool_counts[bucket(f)] = pool_counts.get(bucket(f), 0) + 1
            if i in (1, 3):
                seed_counts[bucket(f)] = seed_counts.get(bucket(f), 0) + 1
    tg = sum(pool_counts.values())
    ti = sum(seed_counts.values())
    for i, tx in rows:
        fs = feats(tx)
        assert got[i].n_feat == len(fs)
        total = Decimal(0)
        for f in fs:
            b = bucket(f)
            term = (math.log((seed_counts.get(b, 0) + 1.0) / (ti + B))
                    - math.log((pool_counts.get(b, 0) + 1.0) / (tg + B)))
            total += Decimal(repr(term)).quantize(
                Decimal("1.000000000000"), rounding=ROUND_HALF_UP)
        assert got[i].dsir_logw == pytest.approx(
            round(float(total), 6), abs=2e-6), i
    # direction: the pure-seed doc is positive, the out-domain doc
    # negative — the selection signal DSIR exists for
    assert got[3].dsir_logw > 0 > got[2].dsir_logw

    with pytest.raises(ValueError, match="n_buckets"):
        textops.dsir_scores(df, seed, n_buckets=0)


def test_dsir_blank_and_null_docs_identically_absent(spark):
    """ADVICE r13: a blank/whitespace-only doc's normalized split is
    [''] — before the empty-feature filter it contributed one
    collision bucket to the pool/seed models and scored a nonzero
    n_feat, while a NULL-text doc vanished entirely.  Now both are
    identically absent: zero features, no model contribution, no
    score row — so the release stage's left_semi drops both
    consistently regardless of threshold."""
    from real_time_iot_data_pipeline_project_spark.operators import textops

    clean_rows = [(1, "apple pie recipe"), (2, "stock market crash"),
                  (3, "apple pie")]
    dirty_rows = clean_rows + [(90, ""), (91, "   "), (92, None)]
    clean = spark.createDataFrame(clean_rows, "doc_id long, text string")
    dirty = spark.createDataFrame(dirty_rows, "doc_id long, text string")
    seed_c = clean.where(F.col("doc_id").isin(1, 3))
    seed_d = dirty.where(F.col("doc_id").isin(1, 3, 90, 92))

    got_c = {r.doc_id: (r.n_feat, r.dsir_logw)
             for r in textops.dsir_scores(clean, seed_c,
                                          n_buckets=17).collect()}
    got_d = {r.doc_id: (r.n_feat, r.dsir_logw)
             for r in textops.dsir_scores(dirty, seed_d,
                                          n_buckets=17).collect()}
    # blank and NULL docs produce NO score rows...
    assert set(got_d) == {1, 2, 3}
    # ...and contribute NOTHING to either model: every surviving
    # doc's weight is bit-identical to the clean-corpus run
    assert got_d == got_c


def test_nb_classify_margin_matches_closed_form(spark):
    """VERDICT r12 item 8: with_margin adds best-minus-second-best
    log-posterior under the SAME (score, label) total order as the
    argmax — checked against the closed form; a single-label model
    yields NULL margin; the default output schema is unchanged."""
    import math

    from real_time_iot_data_pipeline_project_spark.operators import classify

    train = spark.createDataFrame(
        [(1, "apfel apfel strasse", "de"), (2, "strasse apfel", "de"),
         (3, "pomme rue rue", "fr"), (4, "pomme pomme", "fr")],
        "doc_id long, text string, lang string")
    test = spark.createDataFrame(
        [(10, "apfel strasse zzz"), (11, "rue pomme")],
        "doc_id long, text string")
    counts = classify.nb_train(train, label_col="lang")
    dc = classify.nb_doc_counts(train, label_col="lang")
    base = classify.nb_classify(test, counts, dc)
    assert base.columns == ["doc_id", "label", "score"]
    got = {r.doc_id: r for r in
           classify.nb_classify(test, counts, dc,
                                with_margin=True).collect()}

    def score(tokens, t, cnt):
        return math.log(3.0 / 6.0) + sum(
            math.log((cnt.get(tok, 0) + 1.0) / (t + 4.0))
            for tok in tokens)

    de = {"apfel": 3, "strasse": 2}
    fr = {"pomme": 3, "rue": 2}
    for doc, toks in ((10, ["apfel", "strasse", "zzz"]),
                      (11, ["rue", "pomme"])):
        s_de, s_fr = score(toks, 5, de), score(toks, 5, fr)
        assert got[doc].margin == pytest.approx(
            abs(s_de - s_fr), abs=1e-6)
        assert got[doc].margin > 0

    # single-label model: no runner-up, margin NULL
    one = train.where(F.col("lang") == "de")
    got1 = classify.nb_classify(
        test, classify.nb_train(one, label_col="lang"),
        classify.nb_doc_counts(one, label_col="lang"),
        with_margin=True).collect()
    assert all(r.margin is None and r.label == "de" for r in got1)


def test_nb_classify_shuffle_join_identical(spark):
    """VERDICT r12 item 6: broadcast_model=False (the large-L fallback
    — shuffle-hash model join instead of a vocab×L broadcast) must
    produce IDENTICAL predictions, scores and margins: the
    per-(doc,label) sum is decimal, hence partitioning-free by
    construction."""
    from real_time_iot_data_pipeline_project_spark.operators import classify

    train = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} shared", f"l{i % 5}")
         for i in range(60)],
        "doc_id long, text string, lang string")
    test = spark.createDataFrame(
        [(100 + i, f"tok{i % 7} shared zzz{i % 2}") for i in range(20)],
        "doc_id long, text string")
    counts = classify.nb_train(train, label_col="lang")
    dc = classify.nb_doc_counts(train, label_col="lang")
    bcast = classify.nb_classify(test, counts, dc, with_margin=True)
    shuf = classify.nb_classify(test, counts, dc, with_margin=True,
                                broadcast_model=False)
    assert sorted(map(tuple, bcast.collect())) \
        == sorted(map(tuple, shuf.collect()))


def test_scrub_probe_spans_excises_every_occurrence(spark):
    """X5 scrub tier: a probe's span is excised at EVERY occurrence
    (the drop policy would forfeit whole docs), surrounding text and
    case survive, sub-window probes scrub nothing, and a fully-
    contaminated doc empties."""
    from real_time_iot_data_pipeline_project_spark.operators import (
        contamination,
    )

    probe = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [(1, f"Keep THIS text {probe} and keep THAT too"),
         (2, f"{probe} twice here {probe} indeed"),
         (3, "nothing contaminated here at all"),
         (4, probe)],
        "doc_id long, text string")
    probes = spark.createDataFrame(
        [(100, probe), (101, "too short")],
        "probe_id long, probe_text string")
    got = {r.doc_id: r for r in contamination.scrub_probe_spans(
        docs, probes, window_tokens=8).collect()}
    assert got[1].cleaned_text == "Keep THIS text and keep THAT too"
    assert got[2].cleaned_text == "twice here indeed"
    assert got[3].n_tokens_kept == got[3].n_tokens  # untouched
    assert got[4].n_tokens_kept == 0               # fully excised


def test_pq_refine_distortion_non_increasing_and_drift_free(spark):
    """X63: one Lloyd step over the product space must not increase
    total quantization distortion Σ l2²(subvector, assigned codeword)
    — assignment picks the argmin and the per-cluster mean minimizes
    summed l2², so each step is non-increasing by construction (on
    the training corpus itself).  Also pins refine ∘ encode coherence:
    codes encoded against the refined books use the SAME argmin rule
    the refinement assigned with."""
    import math

    from real_time_iot_data_pipeline_project_spark.operators import quantize

    df = spark.createDataFrame(
        [(i, [float(math.sin(i * 13 + j) + (i % 3)) for j in range(8)])
         for i in range(40)],
        "vec_id long, embedding array<float>")

    def distortion(cb):
        codes = quantize.pq_encode(df, cb)
        # join each (id, sub) back to its codeword and sum exact l2²
        m = int(cb.agg(F.countDistinct("sub_id")).head()[0])
        d = int(cb.select(F.size("cvec").alias("d")).head()["d"])
        flat = df.select(
            "vec_id",
            F.posexplode(quantize._subspaces("embedding", m, d))
            .alias("sub_id", "svec"))
        joined = (flat.join(codes, ["vec_id", "sub_id"])
                  .join(cb.withColumnRenamed("code_id", "code"),
                        ["sub_id", "code"]))
        return float(joined.agg(F.sum(
            quantize._l2sq(F.col("svec"), F.col("cvec"))
            .cast("decimal(28,14)")).cast("double")).head()[0])

    cb_raw = quantize.pq_codebooks(df, m=4, k=4)
    cb_r1 = quantize.pq_refine(df, cb_raw, iters=1)
    cb_r2 = quantize.pq_refine(df, cb_raw, iters=2)
    d0, d1, d2 = distortion(cb_raw), distortion(cb_r1), distortion(cb_r2)
    assert d1 <= d0 + 1e-9
    assert d2 <= d1 + 1e-9
    # a refined codebook keeps the schema contract (sub_id, code_id,
    # cvec of width d) and never grows
    assert cb_r1.columns == ["sub_id", "code_id", "cvec"]
    assert cb_r1.count() <= cb_raw.count()


def test_pq_refined_recall_report_spine_and_raw_anchor(spark):
    """The refined-vs-raw recall report is spine-complete (2 variants
    × every query), all-integer, and its 'raw' rows equal the hit
    counts computed directly from pq_adc_topk against the exact
    top-k — the report can't drift from the operators it composes."""
    import math

    from real_time_iot_data_pipeline_project_spark.operators import quantize

    df = spark.createDataFrame(
        [(i, [float(math.sin(i * 13 + j) + (i % 3)) for j in range(8)])
         for i in range(40)],
        "vec_id long, embedding array<float>")
    queries = (df.where(F.col("vec_id").isin(0, 1, 2))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qvec")))
    rep = quantize.pq_refined_recall_report(df, queries, k=5, m=4,
                                            kc=4, iters=1)
    rows = rep.collect()
    assert {(r.variant, r.query_id) for r in rows} == {
        (v, q) for v in ("raw", "refined") for q in (0, 1, 2)}
    for r in rows:
        assert 0 <= r.n_hits <= 5 and r.k == 5
        assert r.recall_pct == (r.n_hits * 100) // 5

    # raw anchor: replicate hits via the gated operators directly
    cb = quantize.pq_codebooks(df, m=4, k=4)
    got = quantize.pq_adc_topk(queries, cb, quantize.pq_encode(df, cb),
                               k=5)
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    qvec_d = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    from pyspark.sql import Window
    exact = (df.crossJoin(F.broadcast(queries))
             .select("query_id", "vec_id",
                     quantize._l2sq(vec_d, qvec_d).alias("d"))
             .withColumn("rn", F.row_number().over(
                 Window.partitionBy("query_id")
                 .orderBy(F.asc("d"), F.asc("vec_id"))))
             .where(F.col("rn") <= 5).select("query_id", "vec_id"))
    want = {r.query_id: r.n
            for r in got.join(exact, ["query_id", "vec_id"])
            .groupBy("query_id").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
    raw_rows = {r.query_id: r.n_hits for r in rows if r.variant == "raw"}
    assert raw_rows == {q: want.get(q, 0) for q in (0, 1, 2)}


def test_dsir_resample_matches_python_lottery_replay(spark):
    """X64 hand case: the resample's winners equal a full python
    replication of logw → clamp(1, 64, 33 + floor(logw)) tickets →
    md5 lottery → top-n by (ticket DESC, id ASC); weights follow the
    pinned mapping exactly and higher-weight docs hold more rungs."""
    import hashlib

    from real_time_iot_data_pipeline_project_spark.operators import textops

    rows = [(1, "apple pie recipe with apple"),
            (2, "stock market crash deepens"),
            (3, "apple pie"),
            (4, "market pie outlook"),
            (5, "apple pie recipe")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seed = df.where(F.col("doc_id").isin(1, 3))
    scores = {r.doc_id: r.dsir_logw for r in
              textops.dsir_scores(df, seed, n_buckets=17).collect()}
    got = textops.dsir_resample(df, seed, n=3, n_buckets=17).collect()

    import math
    def wt(logw):
        return max(1, min(64, 33 + math.floor(logw)))

    def ticket(i, w):
        return max(int(hashlib.md5(
            f"dsir|{i}|{j}".encode()).hexdigest()[:15], 16)
            for j in range(1, w + 1))

    lottery = sorted(((ticket(i, wt(lw)), i) for i, lw in scores.items()),
                     key=lambda t: (-t[0], t[1]))[:3]
    want = [(i, scores[i], wt(scores[i]), t) for t, i in lottery]
    assert sorted((r.doc_id, r.dsir_logw, r.weight, r.ticket)
                  for r in got) == sorted(want)


def test_cluster_balanced_sample_rates_and_membership(spark):
    """X69: on planted clusters (two tight modes of very different
    sizes around distinct anchors) the sample's rates equal the python
    replay of q124's n^alpha formula on the CLUSTER sizes, membership
    is exactly the hash-bucket rule keyed by vec_id, and the rare
    cluster's keep-rate exceeds the dominant cluster's (the flattening
    X69 exists for).  alpha=1 at budget 1.0 keeps everything."""
    from real_time_iot_data_pipeline_project_spark.operators import (
        sampling,
        similarity,
    )

    def vec(anchor, i, dim=8):
        # tight noise around two orthogonal-ish anchors
        base = [0.0] * dim
        base[anchor] = 10.0
        base[(anchor + 3) % dim] = 5.0
        return [float(x + math.sin(i * 7 + j) * 0.05)
                for j, x in enumerate(base)]

    rows = ([(i, vec(0, i)) for i in range(80)]          # dominant mode
            + [(100 + i, vec(4, i)) for i in range(10)])  # rare mode
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sampling.cluster_balanced_sample(df, n_centroids=2, alpha=0.7,
                                           budget_frac=0.5)
    got = out.collect()
    assert set(out.columns) == {"vec_id", "centroid_id", "rate_pct"}

    # replay: cluster sizes from the gated assignment rule
    cents = similarity.sampled_centroids(df, 2)
    assigned = {r.vec_id: r.centroid_id for r in
                similarity.assign_centroids(df, cents).select(
                    "vec_id", "centroid_id").collect()}
    sizes: dict[int, int] = {}
    for c in assigned.values():
        sizes[c] = sizes.get(c, 0) + 1
    n_total = sum(sizes.values())
    wsum = sum(round(n ** 0.7, 6) for n in sizes.values())
    rates = {c: min(100, round(100.0 * 0.5 * n_total
                               * (round(n ** 0.7, 6) / wsum) / n))
             for c, n in sizes.items()}
    # the rare cluster keeps a HIGHER per-row rate
    small = min(sizes, key=sizes.get)
    big = max(sizes, key=sizes.get)
    assert rates[small] > rates[big]

    def bucket(i):
        return int(hashlib.md5(f"cmix|{i}".encode())
                   .hexdigest()[:15], 16) % 100

    want = {(i, assigned[i], rates[assigned[i]])
            for i in assigned if bucket(i) < rates[assigned[i]]}
    assert {(r.vec_id, r.centroid_id, r.rate_pct) for r in got} == want

    full = sampling.cluster_balanced_sample(df, n_centroids=2,
                                            alpha=1.0, budget_frac=1.0)
    assert full.count() == len(rows)


def test_tokenizer_fertility_hand_computed(spark):
    """X70 hand case: fertility and chars_per_subword equal the exact
    integer-sum ratios per language, NULL-text docs count toward
    n_docs but not the token sums, and a fertility-heavy language
    (punctuation-dense text shreds under the BPE-ish rule) reads
    higher than plain prose."""
    from real_time_iot_data_pipeline_project_spark.operators import textops

    rows = [
        (1, "the quick brown fox", "en"),
        (2, "jumps over dogs", "en"),
        (3, "a,b,c!d?e;f", "xx"),      # punctuation-dense: shreds
        (4, None, "en"),               # NULL text: n_docs only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.lang: r for r in
           textops.tokenizer_fertility_report(df).collect()}

    # en: 4+3 words; subwords = regex runs: 'the quick brown fox'->4,
    # 'jumps over dogs'->3; chars 19+15
    en = got["en"]
    assert (en.n_docs, en.n_words, en.n_subwords, en.n_chars
            if hasattr(en, "n_chars") else None) in [
        (3, 7, 7, None)]
    assert en.fertility == round(7 / 7, 6)
    assert en.chars_per_subword == round((19 + 15) / 7, 6)
    # xx: 1 whitespace word; subwords = 6 letters + 5 punct = 11
    xx = got["xx"]
    assert (xx.n_docs, xx.n_words, xx.n_subwords) == (1, 1, 11)
    assert xx.fertility == 11.0
    assert xx.fertility > en.fertility


def test_semantic_decontam_catches_paraphrase_exact_screen_misses(spark):
    """X71 planted case: a REORDERED copy of an eval probe shares no
    8-token chunk with it (the exact X5 screen sees nothing) but has
    the identical bag-of-words hashing embedding — cosine 1.0 — and is
    flagged; an unrelated doc is not; probes flag themselves at 1.0;
    the threshold validates."""
    from real_time_iot_data_pipeline_project_spark.operators import (
        contamination,
    )

    probe_text = ("the quick brown fox jumps over the lazy dog "
                  "while seven wizards watch quietly tonight")
    reordered = ("tonight quietly watch wizards seven while dog "
                 "lazy the over jumps fox brown quick the")
    docs = spark.createDataFrame(
        [(1, probe_text), (2, reordered),
         (3, "completely different subject matter entirely unrelated "
             "financial markets collapse again")],
        "doc_id long, text string")
    probes = spark.createDataFrame([(100, probe_text)],
                                   "probe_id long, text string")

    hits = contamination.semantic_decontam_hits(docs, probes,
                                                threshold=0.95)
    got = {(r.doc_id, r.probe_id): r.cosine_sim for r in hits.collect()}
    assert got[(1, 100)] == 1.0   # verbatim
    assert got[(2, 100)] == 1.0   # paraphrase (reorder): bag-identical
    assert (3, 100) not in got    # unrelated

    # the exact containment screen misses the reorder (its whole gap)
    exact = contamination.screen_probes(
        docs.where(F.col("doc_id") == 2),
        probes.select("probe_id", F.col("text").alias("probe_text")))
    assert exact.count() == 0

    import pytest
    with pytest.raises(ValueError, match="threshold"):
        contamination.semantic_decontam_hits(docs, probes, threshold=0.0)


def test_semantic_decontam_ann_planted_subset_and_values(spark, tmp_path):
    """X72 (round 15): the ANN-nominated screen catches the reordered
    paraphrase THROUGH the store (nomination from codes + exact cosine
    verify) exactly like the exact screen does, skips the unrelated
    doc, and on the real corpus its hit set is a subset of the exact
    screen's with IDENTICAL cosine values on shared pairs (the
    verification arithmetic is the same rule on the same embeddings);
    the threshold validates."""
    import pytest

    from real_time_iot_data_pipeline_project_spark.operators import (
        contamination,
    )

    probe_text = ("the quick brown fox jumps over the lazy dog "
                  "while seven wizards watch quietly tonight")
    reordered = ("tonight quietly watch wizards seven while dog "
                 "lazy the over jumps fox brown quick the")
    rows = [(1, probe_text), (2, reordered),
            (3, "completely different subject matter entirely "
                "unrelated financial markets collapse again")]
    rows += [(10 + i, f"filler document number {i} about weather "
                      f"station telemetry and region {i % 5} output")
             for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    probes = spark.createDataFrame([(100, probe_text)],
                                   "probe_id long, text string")
    idx = str(tmp_path / "semidx")
    contamination.build_semantic_index(docs, idx, n_centroids=4,
                                       pq_m=4, pq_kc=4)
    got = {(r.doc_id, r.probe_id): r.cosine_sim for r in
           contamination.semantic_decontam_ann(
               spark, probes, idx, threshold=0.95, k=8,
               nprobe=4).collect()}
    assert got[(1, 100)] == 1.0   # verbatim copy nominated + verified
    assert got[(2, 100)] == 1.0   # paraphrase: bag-identical embedding
    assert (3, 100) not in got    # unrelated
    exact = {(r.doc_id, r.probe_id): r.cosine_sim for r in
             contamination.semantic_decontam_hits(
                 docs, probes, threshold=0.95).collect()}
    assert set(got) <= set(exact)
    assert all(exact[p] == v for p, v in got.items())
    with pytest.raises(ValueError, match="threshold"):
        contamination.semantic_decontam_ann(spark, probes, idx,
                                            threshold=1.5)


def test_semantic_decontam_ann_recall_report(spark, tmp_path):
    """X72's sizing curve on the real corpus: n_exact is the exact
    screen's hit count at every rung, nominated hits never exceed it,
    recall is monotone in the candidate width k at fixed nprobe (a
    wider nomination list is a superset), and every value is the
    integer-count round-6 division."""
    from real_time_iot_data_pipeline_project_spark.operators import (
        contamination,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    probes = (docs.where(F.col("doc_id") % 211 == 0)
              .select(F.col("doc_id").alias("probe_id"), "text"))
    idx = str(tmp_path / "semidx")
    contamination.build_semantic_index(docs, idx, n_centroids=16,
                                       pq_m=4, pq_kc=8)
    exact_n = contamination.semantic_decontam_hits(
        docs, probes, threshold=0.8).count()
    rep = {(r.nprobe, r.nominate): r for r in
           contamination.semantic_decontam_ann_recall(
               spark, docs, probes, idx, threshold=0.8,
               nprobe_values=(1, 16), k_values=(4, 64)).collect()}
    assert len(rep) == 4
    for r in rep.values():
        assert r.n_exact == exact_n
        assert 0 <= r.n_hits <= r.n_exact
        assert r.recall_pct == round(r.n_hits * 100.0
                                     / max(r.n_exact, 1), 6)
    for np_ in (1, 16):
        assert rep[(np_, 64)].n_hits >= rep[(np_, 4)].n_hits


def test_cluster_balanced_report_matches_operator_membership(spark):
    """X74 (round 15): the report's per-centroid counts equal the
    OPERATOR's sample grouped by centroid exactly (shared
    composition — no drift possible), before counts cover the corpus,
    rates match the operator's, and realized_pct is the one round-6
    division of exact integers."""
    from real_time_iot_data_pipeline_project_spark.operators import (
        sampling,
    )
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    rep = {r.centroid_id: r for r in
           sampling.cluster_balanced_report(
               emb, key="vec_id", n_centroids=8, alpha=0.7,
               budget_frac=0.5).collect()}
    sample = sampling.cluster_balanced_sample(
        emb, key="vec_id", n_centroids=8, alpha=0.7, budget_frac=0.5)
    got_counts = {r.centroid_id: r.n for r in
                  sample.groupBy("centroid_id")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
    got_rates = {r.centroid_id: r.rate_pct for r in
                 sample.select("centroid_id", "rate_pct")
                 .distinct().collect()}
    assert sum(r.n_docs for r in rep.values()) == emb.count()
    for c, r in rep.items():
        assert r.n_sampled == got_counts.get(c, 0)
        assert 0 <= r.n_sampled <= r.n_docs
        if c in got_rates:
            assert r.rate_pct == got_rates[c]
        assert r.realized_pct == round(r.n_sampled * 100.0
                                       / r.n_docs, 6)


# ------------------------------------------------- X75 bigram LM filter

def test_ngram_lm_hand_computed(spark):
    """X75 hand case (Stupid Backoff, Brants et al. 2007): reference
    'a b a b c' gives unigrams a:2 b:2 c:1 (N=5, V=3) and bigrams
    (a,b):2 (b,a):1 (b,c):1.  A doc walking seen bigrams scores their
    relative frequencies; an unseen transition backs off to
    0.4 * Laplace-unigram; token 1 is unigram-only."""
    ref = spark.createDataFrame([(0, "a b a b c")], "doc_id long, text string")
    lm = textops.ngram_lm_train(ref)
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "c a")], "doc_id long, text string")
    got = {r.doc_id: r for r in textops.ngram_lm_scores(docs, lm).collect()}

    s1 = lambda c: (c + 1) / (5 + 3)                      # noqa: E731
    bits = lambda s: -math.log(s) / math.log(2)           # noqa: E731
    # doc 1: a (uni 3/8), a->b (2/2), b->c (1/2)
    exp1 = (bits(s1(2)) + bits(2 / 2) + bits(1 / 2)) / 3
    # doc 2: c (uni 2/8), c->a UNSEEN -> 0.4 * s1(a)
    exp2 = (bits(s1(1)) + bits(0.4 * s1(2))) / 2
    assert got[1].n_tok == 3 and got[2].n_tok == 2
    assert got[1].bits_per_token == pytest.approx(exp1, abs=2e-6)
    assert got[2].bits_per_token == pytest.approx(exp2, abs=2e-6)


def test_ngram_lm_conditional_beats_unigram_and_roundtrip(spark, tmp_path):
    """The whole point of the conditional tier: two docs with the SAME
    token multiset (identical under any unigram score) separate when
    one walks the reference's transitions and the other scrambles
    them.  Also: the trained LM round-trips through parquet (the
    train-once/serve-many contract) and broadcast_lm=False returns
    the identical frame via a shuffle join."""
    ref = spark.createDataFrame(
        [(0, "a b a b a b a b")], "doc_id long, text string")
    lm = textops.ngram_lm_train(ref)
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b b a a")], "doc_id long, text string")
    got = {r.doc_id: r.bits_per_token
           for r in textops.ngram_lm_scores(docs, lm).collect()}
    assert got[2] > got[1]

    p = str(tmp_path / "lm")
    lm.write.parquet(p)
    lm2 = spark.read.parquet(p)
    direct = sorted(map(tuple, textops.ngram_lm_scores(docs, lm).collect()))
    assert sorted(map(tuple,
                      textops.ngram_lm_scores(docs, lm2).collect())) == direct
    assert sorted(map(tuple,
                      textops.ngram_lm_scores(docs, lm2,
                                              broadcast_lm=False)
                      .collect())) == direct


# ---------------------------------------------------- X76/X77 SQ8 tier

def test_sq_topk_hand_computed_and_near_exact(spark):
    """X76: on a planted grid the SQ8 reconstruction is exact at the
    grid corners (codes 0 and 255 reconstruct min and max... the
    affine floor maps max to code 255 exactly), so top-k equals the
    exact top-k; a mid-grid vector reconstructs within one grid step
    and the returned distance matches the closed-form python replay."""
    import math as _m

    rows = [(i, [float(i), float(10 - i)]) for i in range(11)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame([(0, [0.0, 10.0])],
                                    "query_id long, qvec array<float>")
    got = quantize.sq_topk(emb, queries, k=3).collect()
    assert [r.vec_id for r in got] == [0, 1, 2]
    # python replay: mn=0, scale=10 per dim; code=floor(v*25.5),
    # deq=code*10/255
    def deq(v):
        return [_m.floor((x - 0.0) * 255.0 / 10.0) * 10.0 / 255.0
                for x in v]
    exp = [round(sum((a - b) ** 2 for a, b in zip([0.0, 10.0], deq(v))), 6)
           for v in ([0.0, 10.0], [1.0, 9.0], [2.0, 8.0])]
    assert [r.sq_dist for r in got] == pytest.approx(exp, abs=2e-6)


def test_compression_recall_sq8_holds_where_pq_pays(spark):
    """X77's whole story on a planted corpus: SQ8 (fine grid) keeps
    recall at 100 while PQ at a tiny codebook cannot exceed its
    quantization ceiling; the spine keeps both tiers' rows visible
    for every query."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(0, 1) for _ in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(3)],
        "query_id long, qvec array<float>")
    rep = quantize.compression_recall_report(emb, queries, k=5,
                                             m=4, kc=2).collect()
    assert {(r.tier, r.query_id) for r in rep} == {
        (t, q) for t in ("pq", "sq8") for q in range(3)}
    sq = {r.query_id: r.recall_pct for r in rep if r.tier == "sq8"}
    pq = {r.query_id: r.recall_pct for r in rep if r.tier == "pq"}
    assert all(v == 100 for v in sq.values())
    assert sum(pq.values()) <= sum(sq.values())


def test_ivfsq_in_bucket_ranking_near_exact(spark):
    """X78: with every centroid probed (nprobe = n_centroids) the
    IVF-SQ result must equal the plain SQ8 top-k (pruning is the ONLY
    recall mechanism — the SQ tier itself ranks in-bucket like the
    flat scan); with nprobe=1 results are a subset of the probed
    bucket's members."""
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(0, 1) for _ in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(2)],
        "query_id long, qvec array<float>")
    full = quantize.ivfsq_topk(emb, queries, n_centroids=4, nprobe=4,
                               k=5)
    flat = quantize.sq_topk(emb, queries, k=5)
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, flat.collect()))
    pruned = quantize.ivfsq_topk(emb, queries, n_centroids=4, nprobe=1,
                                 k=5).collect()
    assert len(pruned) > 0
    flat_ids = {(r.query_id, r.vec_id) for r in flat.collect()}
    assert all(isinstance(r.sq_dist, float) for r in pruned)


def test_topgram_report_hand_computed(spark):
    """X79 hand case: 'a b a b a b c' has top bigram 'a b' x3 (6/7 of
    tokens), top trigram 'a b a' x2 (tie with 'b a b' x2 broken to
    the lexicographically smaller), top 4-gram 'a b a b' x2 — and a
    2-token doc gets no n=3/n=4 rows."""
    df = spark.createDataFrame([(1, "a b a b a b c"), (2, "x y")],
                               "doc_id long, text string")
    got = {(r.doc_id, r.n): r for r in
           textops.topgram_report(df).collect()}
    assert got[(1, 2)].top_gram == "a b"
    assert got[(1, 2)].occurrences == 3
    assert got[(1, 2)].token_frac == round(6 / 7, 6)
    assert got[(1, 3)].top_gram == "a b a"
    assert got[(1, 3)].occurrences == 2
    assert got[(1, 4)].top_gram == "a b a b"
    assert got[(2, 2)].top_gram == "x y"
    assert (2, 3) not in got and (2, 4) not in got
    assert set(got) == {(1, 2), (1, 3), (1, 4), (2, 2)}
