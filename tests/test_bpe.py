"""Real BPE tokenizer (X41): training determinism, table
well-formedness, the single-step ≡ all-occurrences theorem, and the
distributed recursive-CTE encoder vs the pure-Python reference."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_iot_data_pipeline_project_spark.functions import bpe


def test_training_is_deterministic_and_pinned():
    """Same seed text → same table; spot-pin the head so a silent
    change to training or seed text is caught loudly (update the pins
    DELIBERATELY if either ever changes)."""
    t1 = bpe.train_bpe(bpe.SEED_TEXT)
    t2 = bpe.train_bpe(bpe.SEED_TEXT)
    assert t1 == t2 == list(bpe.merges())
    assert t1[0] == ("h", "e")
    assert t1[1] == ("t", "he")
    assert ("ta", "ble") in t1[:16]
    assert len(t1) > 100


def test_merge_table_well_formed():
    bpe.assert_well_formed(bpe.merges())


def test_ill_formed_table_rejected():
    with pytest.raises(AssertionError, match="never produced"):
        bpe.assert_well_formed((("ab", "c"),))


def test_training_tie_break_lexicographic():
    """'ba' and 'ab' both occur twice in 'abab ba ab'… construct a
    clean tie: two pairs with equal counts → smallest pair wins."""
    # words: 'xy' ×2, 'uv' ×2 → pairs (x,y):2, (u,v):2 → tie → (u,v)
    table = bpe.train_bpe("xy xy uv uv", n_merges=1)
    assert table == [("u", "v")]


def test_training_stops_below_two():
    """Singleton pairs are never merged (no compression value)."""
    table = bpe.train_bpe("abc def", n_merges=10)
    assert table == []


def test_encode_word_matches_known():
    assert bpe.encode_word("table") == ["table"]
    assert bpe.encode_word("the") == ["the"]
    # unseen letters stay character-split
    assert bpe.encode_word("xqzj") == ["x", "q", "z", "j"]
    # concatenation invariant: tokens reassemble the word
    for w in ["customer", "windowing", "aggregate", "pipeline."]:
        assert "".join(bpe.encode_word(w)) == w


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz.,;- ", max_size=90))
def test_single_step_equals_all_occurrences(text):
    """The theorem the distributed encoders rely on: for the pinned
    (well-formed) table, merging one occurrence of the min-rank pair
    per step reaches the same fixpoint as the classic rule."""
    for w in text.split():
        assert bpe.encode_word_single_step(w) == bpe.encode_word(w)


def test_single_step_equality_needs_well_formed():
    """Counter-example pinning WHY well-formedness is required: on an
    ill-formed table the two rules genuinely DIVERGE, so the theorem's
    hypothesis is real, not decorative. Table (('ab','a'), ('a','b'))
    is ill-formed ('ab' is merged before any merge produces it) — on
    'abab' the all-occurrences rule merges BOTH (a,b) occurrences in
    one pass then joins them (['ab','ab']), while the one-merge-per-
    step rule merges only the first, after which ('ab','a') — the
    lower rank — fires first (['aba','b'])."""
    ill = (("ab", "a"), ("a", "b"))
    with pytest.raises(AssertionError):
        bpe.assert_well_formed(ill)
    assert bpe.encode_word("abab", ill) == ["ab", "ab"]
    assert bpe.encode_word_single_step("abab", ill) == ["aba", "b"]
    assert (bpe.encode_word("abab", ill)
            != bpe.encode_word_single_step("abab", ill))
    # chunking guard: both mirrors chunk identically on the REAL table
    long = "ab" * 40
    assert bpe.encode_word(long) == bpe.encode_word_single_step(long)


def test_chunking_bounds_sequences():
    """Words beyond MAX_WORD_CHARS split into independent 32-char
    chunks: tokens never span a chunk boundary, and the number of
    merge steps per chunk is bounded by 31."""
    w = "table" * 20  # 100 chars -> chunks of 32/32/32/4
    toks = bpe.encode_word(w)
    assert "".join(toks) == w
    # reconstruct chunk boundaries: cumulative lengths must hit 32/64/96
    cuts, acc = set(), 0
    for t in toks:
        acc += len(t)
        cuts.add(acc)
    for boundary in (32, 64, 96):
        assert boundary in cuts


def _py_freq(rows):
    import collections

    cnt = collections.Counter()
    docs = collections.defaultdict(set)
    for doc_id, text in rows:
        for w in [w for w in (text or "").lower().split() if w]:
            for t in bpe.encode_word(w):
                cnt[t] += 1
                docs[t].add(doc_id)
    return {t: (c, len(docs[t])) for t, c in cnt.items()}


def test_spark_recursive_encoder_matches_reference(spark):
    """Distributed recursive-CTE encoder ≡ pure-Python classic encoder
    on a word list covering merges, unseen chars, and >32-char words."""
    from real_time_iot_data_pipeline_project_spark.operators import tokenize

    random.seed(11)
    alpha = "abcdefghijklmnopqrstuvwxyz.,;"
    words = (["table", "windowing", "the", "customer", "xqzj", "a",
              "table" * 20, "ab" * 40]
             + ["".join(random.choice(alpha)
                        for _ in range(random.randint(1, 45)))
                for _ in range(60)])
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r.w: list(r.tokens)
           for r in tokenize.encode_distinct_words(spark, df).collect()}
    assert set(got) == set(words)
    for w in set(words):
        assert got[w] == bpe.encode_word(w), w


def test_bpe_token_frequency_matches_reference(spark):
    from real_time_iot_data_pipeline_project_spark.operators import tokenize

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = tokenize.bpe_token_frequency(spark, docs)
    got = {r.token: (r.n_occurrences, r.n_docs) for r in out.collect()}
    ref = _py_freq([(r.doc_id, r.text)
                    for r in docs.select("doc_id", "text").collect()])
    assert got == ref


def test_with_bpe_tokens_order_and_counts(spark):
    """Per-doc token sequences come back in DOCUMENT order (posexplode
    → chunk_idx → merge order), and n_bpe_tokens is their length; a
    doc with no words gets an empty array, not null."""
    from real_time_iot_data_pipeline_project_spark.operators import tokenize

    rows = [(1, "the table holds the data"), (2, ""), (3, "   "),
            (4, "windowing aggregate")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
           for r in tokenize.with_bpe_tokens(spark, df).collect()}
    expect1 = (bpe.encode_word("the") + bpe.encode_word("table")
               + bpe.encode_word("holds") + bpe.encode_word("the")
               + bpe.encode_word("data"))
    assert out[1] == (expect1, len(expect1))
    assert out[2] == ([], 0)
    assert out[3] == ([], 0)
    expect4 = bpe.encode_word("windowing") + bpe.encode_word("aggregate")
    assert out[4] == (expect4, len(expect4))


def test_merges_sql_array_quoting():
    from real_time_iot_data_pipeline_project_spark.operators import tokenize

    lit = tokenize.merges_sql_array()
    assert lit.startswith("array('") and lit.endswith("')")
    assert bpe.SEP in lit
    # the pinned table contains no quotes today; the quoting path is
    # exercised directly
    assert tokenize._sql_quote("o'x") == "'o''x'"


def test_bpe_token_counts_match_array_path(spark):
    """The count-only consumer path (q133's input) equals
    size(with_bpe_tokens.bpe_tokens) on every doc — including the
    wordless docs' zero — without ever building the arrays."""
    from real_time_iot_data_pipeline_project_spark.operators import tokenize

    rows = [(1, "the table holds the data"), (2, ""), (3, "   "),
            (4, "windowing aggregate"), (5, "a " * 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = {r.doc_id: r.n_bpe_tokens for r in
            tokenize.bpe_token_counts(spark, df).collect()}
    full = {r.doc_id: r.n_bpe_tokens for r in
            tokenize.with_bpe_tokens(spark, df).collect()}
    assert fast == full and fast[2] == 0 and fast[3] == 0
    assert set(fast) == {1, 2, 3, 4, 5}


def test_hash_rank_impl_matches_scan(spark):
    """rank_impl='hash' (the O(1) open-hash bucket lookup — the 32k-
    production-vocab setting, VERDICT r10 item 5) produces EXACTLY the
    scan impl's tokens on a chunk set covering merges, unseen chars,
    and adversarial repetition."""
    from real_time_iot_data_pipeline_project_spark.operators import tokenize

    random.seed(23)
    alpha = "abcdefghijklmnopqrstuvwxyz.,;"
    words = (["table", "windowing", "the", "xqzj", "ab" * 16]
             + ["".join(random.choice(alpha)
                        for _ in range(random.randint(1, 32)))
                for _ in range(40)])
    df = spark.createDataFrame([(w,) for w in set(words)], "c string")
    scan = {r.c: list(r.tokens)
            for r in tokenize.encode_chunks(spark, df).collect()}
    hashed = {r.c: list(r.tokens)
              for r in tokenize.encode_chunks(
                  spark, df, rank_impl="hash").collect()}
    assert scan == hashed
    # and both equal the classic reference encoder
    for w, toks in scan.items():
        assert toks == bpe.encode_word(w), w
    with pytest.raises(ValueError, match="rank_impl"):
        tokenize._spark_ranks_expr("s", "bogus")


def test_rank_buckets_shape_and_lookup(spark):
    """The bucket literal: M is the power of two giving load ≤ 0.5,
    every pinned merge resolves to its 1-based rank through the hash
    path, and a miss resolves to 0 (array_position's contract)."""
    from real_time_iot_data_pipeline_project_spark.operators import tokenize
    from real_time_iot_data_pipeline_project_spark.functions import bpe as bpemod

    _, m = tokenize.rank_buckets_sql()
    v = len(bpemod.merges())
    assert m & (m - 1) == 0 and m >= 2 * v
    with pytest.raises(ValueError, match="non-empty"):
        tokenize.rank_buckets_sql([])

    pairs = [p1 + bpemod.SEP + p2 for p1, p2 in bpemod.merges()]
    probe = pairs + ["zz" + bpemod.SEP + "qq"]  # one guaranteed miss
    df = spark.createDataFrame([(k,) for k in probe], "k string")
    got = {r.k: r.rank for r in df.selectExpr(
        "k", tokenize._rank_lookup_hash("k") + " AS rank").collect()}
    assert got["zz" + bpemod.SEP + "qq"] == 0
    for rank, key in enumerate(pairs, start=1):
        assert got[key] == rank, key
