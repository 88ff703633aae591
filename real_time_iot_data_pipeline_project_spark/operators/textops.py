"""Document-table text analysis operators (language-ID, quality, token
stats, fingerprints) — thin DataFrame wrappers over the pure column
expressions in functions.textfns. All narrow projections: zero shuffles,
fully codegen'd, linear scans at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textfns


def text_stats(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-doc token/char counts + ratios."""
    return df.select(
        F.col(id_col),
        textfns.char_count(text_col).alias("n_chars"),
        textfns.token_count(text_col).alias("n_tokens"),
        textfns.bpe_token_count(text_col).alias("n_bpe_tokens"),
        F.round(textfns.mean_token_length(text_col), 6).alias("mean_token_len"),
        F.round(textfns.punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(textfns.stopword_ratio(text_col), 6).alias("stopword_ratio"),
    )


def quality_scores(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        F.round(textfns.quality_score(text_col), 6).alias("quality"),
    )


def detect_languages(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        textfns.detect_language(text_col).alias("detected_lang"),
    )


def fingerprints(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        textfns.fingerprint(text_col).alias("fingerprint"),
        textfns.portable_hash60(textfns.normalize_text(text_col)).alias("hash60"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition/diversity signals, entirely JVM-side
    (array functions over the token list — no explode, no shuffle):

    - ``ttr``: type-token ratio (distinct/total tokens) — low values
      flag word-soup and boilerplate;
    - ``dup_bigram_frac``: fraction of consecutive-token bigrams that
      are repeats of an earlier bigram — the duplicate-n-gram filter of
      the Gopher rules (Rae et al. 2021, public), n=2;
    - ``mean_tok_len``: mean token length (degenerate values flag
      non-linguistic content).

    Scales as a pure scan-stage projection: O(tokens) per doc, zero
    Exchange, whole-stage codegen.
    """
    toks = textfns.whitespace_tokens(text_col)
    n = F.size(toks)
    # consecutive bigrams: zip tokens with their own tail; Spark's
    # zip_with null-pads the shorter side, so slice to n-1 first
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )
    n_bi = F.size(bigrams)
    return df.select(
        F.col(id_col),
        n.alias("n_tok"),
        F.round(F.size(F.array_distinct(toks)) / n, 6).alias("ttr"),
        F.when(n >= 2, F.round(F.lit(1.0) - F.size(F.array_distinct(bigrams)) / n_bi, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
        F.round(
            F.length(F.regexp_replace(textfns.normalize_text(text_col), " ", "")) / n, 6
        ).alias("mean_tok_len"),
    )


def corpus_token_stats(df: DataFrame, text_col: str = "text",
                       ln2: float = 0.6931471805599453) -> DataFrame:
    """Corpus-level unigram distribution stats (1 row): total/vocab
    token counts, type-token ratio, singleton fraction, Shannon entropy
    in bits. One token-keyed grouped agg + a 1-row broadcast; entropy
    terms are DECIMAL-cast pre-sum so the reduction is order-free
    (registry determinism rule 1) — at 100 TB the vocab-sized frequency
    table is the only shuffled state."""
    toks = df.select(F.explode(textfns.whitespace_tokens(text_col)).alias("tok"))
    f = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    t = f.agg(
        F.sum("c").alias("total_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum((F.col("c") == 1).cast("long")).alias("n_singletons"),
    )
    p = F.col("c").cast("double") / F.col("total_tokens")
    term = (p * F.log(p) / F.lit(ln2)).cast("decimal(18,15)")
    return (
        f.crossJoin(F.broadcast(t))
        .groupBy("total_tokens", "vocab_size", "n_singletons")
        .agg(F.round((-F.sum(term)).cast("double"), 6).alias("entropy_bits"))
        .select(
            "total_tokens", "vocab_size",
            F.round(F.col("vocab_size").cast("double") / F.col("total_tokens"), 9)
            .alias("type_token_ratio"),
            F.round(F.col("n_singletons").cast("double") / F.col("vocab_size"), 9)
            .alias("singleton_frac"),
            "entropy_bits",
        )
    )


def unigram_logprob_scores(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           ln2: float = 0.6931471805599453) -> DataFrame:
    """Per-doc unigram cross-entropy in bits/token — the cheap stand-in
    for the CCNet/Wikipedia-LM perplexity filter: docs whose tokens are
    improbable under the corpus's own unigram distribution (gibberish,
    boilerplate soup, wrong-language) score high and get cut.

    Scale shape: token frequencies are a vocab-sized table → broadcast
    back onto the token stream (never a shuffle of the corpus by token);
    the per-doc reduction is one doc-keyed combinable agg with
    DECIMAL-cast terms (order-free, registry rule 1)."""
    toks = df.select(
        F.col(id_col), F.explode(textfns.whitespace_tokens(text_col)).alias("tok")
    )
    f = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    t = f.agg(F.sum("c").cast("double").alias("total"))
    p = F.col("c").cast("double") / F.col("total")
    term = (F.log(p) / F.lit(ln2)).cast("decimal(18,12)")
    return (
        toks.join(F.broadcast(f), "tok")
        .crossJoin(F.broadcast(t))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(
                (-F.sum(term)).cast("double") / F.count(F.lit(1)), 6
            ).alias("bits_per_token"),
        )
    )


def source_novelty(df: DataFrame, text_col: str = "text",
                   source_col: str = "source", n: int = 3) -> DataFrame:
    """Marginal n-gram novelty per source (X49): the data-valuation
    report behind "what does adding this dataset actually contribute?"
    — for each source, how many of its distinct word n-grams appear in
    NO source ahead of it in the priority order.  A source whose
    n-grams are mostly first-seen elsewhere adds volume, not content
    (the redundancy the dedup tier removes doc-by-doc, measured here
    corpus-by-corpus before anything is ingested); novelty is the
    curve data-mixing decisions read (Lee et al. 2021 arXiv:2107.06499
    §5 measures exactly this marginal-value collapse on C4's
    duplicates).

    Priority order = ascending ``source_col`` value (deterministic and
    engine-neutral; callers wanting a custom precedence map names to
    sortable labels first — the same convention as the dedup tier's
    min-id survivor rule).  A source's ``novel_ngrams`` counts the
    distinct n-grams whose MINIMUM owning source is itself.

    Unit: stride-1 word n-grams over the normalized whitespace token
    grid — the duplicate-span family's grid (dedup._window_grid) keyed
    by source instead of doc, so "n-gram identity" here is the same
    md5-of-joined-tokens the span scrubber keys on and the numbers
    compose (docs shorter than ``n`` tokens contribute nothing).

    Scale shape: one map-side explode to (source, hash) — text never
    leaves the scan stage, the grid carries 32-byte hashes; then two
    partial-aggregatable groupBys (distinct per (source, hash), min
    source per hash) and strata-sized joins.  Returns one row per
    source: ``total_ngrams`` (occurrences), ``distinct_ngrams``,
    ``novel_ngrams``, ``novelty_bp`` (novel·10000 DIV distinct — basis
    points, exact integer)."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    from . import dedup

    grid = dedup._window_grid(
        dedup._span_base(df, text_col, source_col), source_col, n
    ).select(F.col(source_col), F.col("wh"))
    occ = grid.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("total_ngrams"))
    ds = grid.distinct()
    dist = (ds.groupBy(source_col)
            .agg(F.count(F.lit(1)).alias("distinct_ngrams"))
            .withColumnRenamed(source_col, "__sd"))
    # the minimum owning source of each distinct n-gram IS the source
    # whose novel count it increments — no join back to the grid.
    # min() skips NULL, so a NULL source holds the LOWEST priority:
    # it is only ever novel on n-grams no named source carries.
    novel = (ds.groupBy("wh").agg(F.min(source_col).alias("__sn"))
             .groupBy("__sn")
             .agg(F.count(F.lit(1)).alias("novel_ngrams")))
    return (occ.join(dist, occ[source_col].eqNullSafe(dist["__sd"]))
            .join(novel, occ[source_col].eqNullSafe(novel["__sn"]),
                  "left")
            .withColumn("novel_ngrams",
                        F.coalesce("novel_ngrams", F.lit(0)))
            .withColumn("novelty_bp",
                        F.expr("novel_ngrams * 10000 DIV distinct_ngrams"))
            .select(source_col, "total_ngrams", "distinct_ngrams",
                    "novel_ngrams", "novelty_bp"))


def moore_lewis_scores(df: DataFrame, seed: DataFrame,
                       text_col: str = "text", id_col: str = "doc_id",
                       ln2: float = 0.6931471805599453) -> DataFrame:
    """Cross-entropy difference data selection (X51): score every
    candidate doc by how much more probable its tokens are under an
    IN-DOMAIN seed model than under the general pool's own model —
    Moore & Lewis 2010 ("Intelligent Selection of Language Model
    Training Data", ACL), the standard model-based selection rule
    behind targeted pretraining mixes and the ancestor of the
    CCNet/GPT-3 quality-classifier filters.  Both models are add-one-
    smoothed unigram LMs over the SHARED vocabulary (Laplace over
    V = distinct tokens of pool ∪ seed, so an unseen-in-seed token is
    a finite penalty, not −∞, and both models are proper
    distributions over the same support).

    ``ml_bits`` = H_seed(doc) − H_pool(doc) in bits/token
    (mean over tokens of log2 p_pool − log2 p_seed): NEGATIVE means
    the seed model likes the doc more than the pool model does —
    in-domain; select ascending up to a threshold/budget (feed the
    score straight into quality bands or the waterfill tier).

    Cross-engine determinism is q72's ln-policy, verbatim: each
    per-token term is the identical expression tree in both engines
    ((cnt+1.0)/double(total+V), one ln each, one division by ln2) cast
    to DECIMAL(18,12) BEFORE the sum — order-free — and the final
    per-token mean is rounded to 6 dp.

    Scale shape: token frequencies are two vocab-sized tables
    broadcast back onto the candidate token stream (never a corpus
    shuffle by token); the scalar constants (V, both totals) ride ONE
    broadcast 1-row frame; the per-doc reduction is one doc-keyed
    combinable agg.  Returns (id_col, n_tok, ml_bits)."""
    toks = df.select(
        F.col(id_col),
        F.explode(textfns.whitespace_tokens(text_col)).alias("tok"))
    fg = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_g"))
    fi = (seed.select(F.explode(
              textfns.whitespace_tokens(text_col)).alias("tok"))
          .groupBy("tok").agg(F.count(F.lit(1)).alias("c_i")))
    consts = (
        fg.select("tok").unionByName(fi.select("tok")).distinct()
        .agg(F.count(F.lit(1)).alias("v"))
        .crossJoin(fg.agg(F.sum("c_g").alias("tg")))
        .crossJoin(fi.agg(F.coalesce(F.sum("c_i"), F.lit(0))
                          .alias("ti"))))
    p_g = ((F.col("c_g").cast("double") + F.lit(1.0))
           / (F.col("tg") + F.col("v")).cast("double"))
    p_i = ((F.coalesce(F.col("c_i"), F.lit(0)).cast("double")
            + F.lit(1.0))
           / (F.col("ti") + F.col("v")).cast("double"))
    term = ((F.log(p_g) - F.log(p_i)) / F.lit(ln2)).cast("decimal(18,12)")
    return (
        toks.join(F.broadcast(fg), "tok")      # pool tokens: always hit
        .join(F.broadcast(fi), "tok", "left")  # unseen in seed: smoothed
        .crossJoin(F.broadcast(consts))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tok"),
             F.round(F.sum(term).cast("double") / F.count(F.lit(1)),
                     6).alias("ml_bits")))


def dsir_resample(df: DataFrame, seed: DataFrame, n: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_buckets: int = 10_000, salt: str = "dsir",
                  max_weight: int = 64,
                  scores: DataFrame | None = None) -> DataFrame:
    """DSIR's actual selection step (round 14, X64 — VERDICT r13
    item 4): importance RESAMPLING ∝ weight, not thresholding — Xie
    et al. 2023 §3 sample the kept set with probability proportional
    to the importance weight, which keeps the selected corpus
    DIVERSE (a threshold keeps only the most seed-like mass; the
    resample keeps a weight-tilted cross-section of the pool).

    Composed from two gated rules: :func:`dsir_scores`' log weight
    feeds C3's integer-ticket lottery
    (sampling.weighted_sample_tickets, q104/q139's sampler) through
    THE pinned logw → integer-weight mapping::

        tickets = clamp(1, max_weight, 33 + floor(dsir_logw))

    — 1-nat log-buckets of the true importance weight exp(logw),
    centered so logw = 0 (seed-indifferent) holds 33 of 64 rungs.
    The sampler's own docstring convention ("pre-bucket real-valued
    weights onto a small integer scale — log buckets preserve
    ratios") applied to a weight that IS already a log; floor of the
    gated 6-dp logw is the identical double in both engines, so
    membership is hash-exact cross-engine (no Efraimidis-Spirakis
    transcendental keys — rule 2/4).  Returns the n winners as
    (id, dsir_logw, weight, ticket).

    Scale: dsir_scores' broadcast-model shapes + the sampler's
    bounded map-side ticket explode (≤ max_weight per doc), one
    combinable per-key max, TakeOrderedAndProject."""
    from .sampling import weighted_sample_tickets

    if scores is None:
        scores = dsir_scores(df, seed, text_col=text_col, id_col=id_col,
                             n_buckets=n_buckets)
    weighted = scores.select(
        id_col, "dsir_logw",
        (F.lit(33) + F.floor(F.col("dsir_logw"))).alias("__wt"))
    won = weighted_sample_tickets(weighted, key=id_col,
                                  weight_col="__wt", k=n, salt=salt,
                                  max_weight=max_weight)
    return (won.join(scores.select(id_col, "dsir_logw"), id_col)
            .select(id_col, "dsir_logw", "weight", "ticket"))


def _hashed_ngram_features(df: DataFrame, text_col: str,
                           keep_cols: list[str],
                           n_buckets: int) -> DataFrame:
    """The DSIR feature stream: one row per hashed word unigram AND
    bigram occurrence of the normalized token grid, bucketed by the
    portable 60-bit hash mod ``n_buckets`` (Xie et al. 2023 §3 use
    hashed {uni,bi}-gram counts as the feature space — the hashing
    trick keeps the model tables bucket-sized regardless of
    vocabulary).  Map-side only: explode + hash, no shuffle.

    Empty features are dropped: the normalized token grid never
    contains '' EXCEPT for a blank/whitespace-only doc, whose split
    yields [''] — without the filter that doc contributed one
    collision bucket to the models and scored a nonzero n_feat while
    a NULL-text doc vanished entirely (ADVICE r13).  With it, blank
    and NULL docs are treated identically: zero features, absent from
    the models AND from dsir_scores output (so the release stage's
    left_semi drops both regardless of threshold)."""
    toks = textfns.whitespace_tokens(text_col)
    base = df.select(*keep_cols, toks.alias("__toks"))
    feats = F.concat(
        F.col("__toks"),
        F.expr("zip_with(slice(__toks, 1, size(__toks) - 1), "
               "slice(__toks, 2, size(__toks) - 1), "
               "(a, b) -> concat(a, ' ', b))"))
    return (base.select(*keep_cols, F.explode(feats).alias("__f"))
            .where(F.col("__f") != "")
            .select(*keep_cols,
                    F.pmod(textfns.portable_hash60("__f"),
                           F.lit(n_buckets)).alias("bucket")))


def dsir_scores(df: DataFrame, seed: DataFrame,
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 10_000,
                pool_counts: DataFrame | None = None) -> DataFrame:
    """Data Selection via Importance Resampling scores (X56): per
    candidate doc, the log importance weight ln p_seed(doc) −
    ln p_pool(doc) under two bag-of-hashed-ngram multinomials — Xie
    et al. 2023 ("Data Selection for Language Models via Importance
    Resampling", NeurIPS, arXiv:2302.03169), the importance-weighting
    generalization of Moore-Lewis: where :func:`moore_lewis_scores`
    ranks by per-TOKEN cross-entropy difference under unigram LMs,
    DSIR weights by the full likelihood ratio under hashed
    unigram+bigram features, so doc length and phrase structure
    participate (the paper's KL-reduction results are measured on
    exactly this feature space at 10k buckets — the default here).

    Both multinomials are add-one smoothed over the SAME ``n_buckets``
    support (the q147 convention — a bucket unseen in the seed is a
    finite penalty, never −∞, and both models are proper over one
    support).  ``dsir_logw`` = Σ_occurrences ln(p_seed[b]/p_pool[b]):
    POSITIVE means the seed model prefers the doc — select descending
    by threshold or top-k, or feed it as the weight of an importance
    resampler.  Determinism is q72/q147's ln policy verbatim: each
    per-occurrence term is the identical expression tree in both
    engines ((c+1.0)/double(total+B), one ln each), DECIMAL(18,12)-
    cast pre-sum (order-free), final 6-dp round.

    Scale shape: the two model tables are bucket-sized (≤ n_buckets
    rows — the hashing trick's whole point) and BROADCAST onto the
    candidate feature stream; the scalar totals ride one broadcast
    1-row frame; the per-doc reduction is one doc-keyed combinable
    agg.  Never a corpus shuffle keyed by token or bucket.  Returns
    (id_col, n_feat, dsir_logw).

    ``pool_counts`` accepts a precomputed (bucket, c_g) pool model —
    the streaming fold's read (X59, dsir_stream.dsir_pool_counts):
    bucket counts are exactly mergeable integers, so a model folded
    from any batching of the pool equals the one computed here from
    the concatenated frame bit-for-bit (q156's gate proves it
    cross-engine — its oracle is q153's SQL verbatim)."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    feats = _hashed_ngram_features(df, text_col, [id_col], n_buckets)
    fg = (pool_counts if pool_counts is not None
          else _hashed_ngram_features(df, text_col, [], n_buckets)
          .groupBy("bucket").agg(F.count(F.lit(1)).alias("c_g")))
    fi = (_hashed_ngram_features(seed, text_col, [], n_buckets)
          .groupBy("bucket").agg(F.count(F.lit(1)).alias("c_i")))
    consts = (
        fg.agg(F.coalesce(F.sum("c_g"), F.lit(0)).alias("tg"))
        .crossJoin(fi.agg(F.coalesce(F.sum("c_i"), F.lit(0))
                          .alias("ti"))))
    p_i = ((F.coalesce(F.col("c_i"), F.lit(0)).cast("double")
            + F.lit(1.0))
           / (F.col("ti") + F.lit(n_buckets)).cast("double"))
    p_g = ((F.coalesce(F.col("c_g"), F.lit(0)).cast("double")
            + F.lit(1.0))
           / (F.col("tg") + F.lit(n_buckets)).cast("double"))
    term = (F.log(p_i) - F.log(p_g)).cast("decimal(18,12)")
    return (
        feats.join(F.broadcast(fg), "bucket", "left")
        .join(F.broadcast(fi), "bucket", "left")
        .crossJoin(F.broadcast(consts))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_feat"),
             F.round(F.sum(term).cast("double"), 6).alias("dsir_logw")))


def tokenizer_fertility_report(df: DataFrame, text_col: str = "text",
                               lang_col: str = "lang") -> DataFrame:
    """Per-language tokenizer FERTILITY report (round 14, X70):
    subword tokens per whitespace word and characters per subword —
    the standard tokenizer-evaluation table (fertility ≈ 1 means the
    vocabulary covers the language's words whole; fertility ≫ 1 means
    the tokenizer shreds it, inflating sequence lengths and training
    cost for that language).  At 100 TB you read THIS table before
    committing to a vocabulary: a language at fertility 3 costs 3× the
    compute per word of one at 1.2, and the per-language budget math
    (X37/X44's mixes are in tokens) silently shifts.

    Counts are the gated textfns expressions (whitespace token_count
    over the normalized grid, the BPE-ish regex subword counter,
    char_count) summed as exact integers; the two ratios are one
    round-6 division of exact integers — deterministic cross-engine
    (q168's gate).  Scale: one scan, one lang-keyed combinable
    aggregate — dimension-sized output."""
    words = textfns.token_count(text_col).cast("long")
    subwords = textfns.bpe_token_count(text_col).cast("long")
    chars = textfns.char_count(text_col).cast("long")
    return (df.groupBy(lang_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(words).alias("n_words"),
                 F.sum(subwords).alias("n_subwords"),
                 F.sum(chars).alias("n_chars"))
            .select(lang_col, "n_docs", "n_words", "n_subwords",
                    F.round(F.col("n_subwords").cast("double")
                            / F.col("n_words"), 6).alias("fertility"),
                    F.round(F.col("n_chars").cast("double")
                            / F.col("n_subwords"), 6)
                    .alias("chars_per_subword")))


def ngram_lm_train(ref: DataFrame, text_col: str = "text") -> DataFrame:
    """Train a bigram language model with STUPID BACKOFF smoothing
    (Brants et al. 2007, "Large Language Models in Machine
    Translation" — the smoothing scheme designed explicitly for
    distributed count-based training: no discounting pass, no
    normalization pass, just counts) on a REFERENCE corpus — the
    CCNet recipe (Wenzek et al. 2020): the LM is trained on a small
    curated slice (their Wikipedia) and then scores the whole crawl,
    so the model tables are bounded by the REFERENCE size, never the
    corpus.  This upgrades `unigram_logprob_scores` (q72's
    order-free stand-in) to a real conditional model: word-soup with
    plausible unigrams but impossible transitions now scores high.

    Returns ONE persistable frame of rows ``(prev, cur, c)`` —
    ``prev IS NULL`` marks the unigram tier (``cur`` count), non-null
    the bigram tier — so a trained LM round-trips through parquet and
    is scored against many corpora (the X62 train-once/serve-many
    convention).  Totals (N, V) are derived from the unigram tier at
    score time; nothing else is needed.

    Scale: two token-keyed combinable aggregates over the reference
    (unigram + bigram counts); the bigram grid is built JVM-side with
    ``transform`` over the token array — no posexplode of pairs, no
    shuffle wider than the count tables themselves.  The token array
    is MATERIALIZED once per row before the pair lambda references it
    (optimization round 15, guide §1.2: an inline tokens expression
    inside an interpreted HOF lambda re-ran the regex+split per token
    position — the q177 catch, same fix).
    """
    base = ref.select(
        textfns.whitespace_tokens(text_col).alias("__toks"))
    toks = F.col("__toks")
    uni = (base.select(F.explode(toks).alias("cur"))
           .groupBy("cur").agg(F.count(F.lit(1)).alias("c"))
           .select(F.lit(None).cast("string").alias("prev"), "cur", "c"))
    pairs = F.filter(
        F.transform(
            toks,
            lambda x, i: F.struct(
                F.when(i > 0, F.element_at(toks, i)).alias("prev"),
                x.alias("cur")),
        ),
        lambda s: s["prev"].isNotNull(),
    )
    bi = (base.select(F.explode(pairs).alias("p"))
          .select(F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
          .groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c")))
    return uni.unionByName(bi)


def ngram_lm_scores(df: DataFrame, lm: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    alpha: float = 0.4, broadcast_lm: bool = True,
                    ln2: float = 0.6931471805599453) -> DataFrame:
    """Score every document's cross-entropy in bits/token under a
    Stupid-Backoff bigram LM from `ngram_lm_train` — the CCNet
    perplexity filter's actual shape (train on curated reference,
    cut the crawl's high-perplexity tail).  Scoring rule, fully
    deterministic cross-engine:

    - token 1 (no context) and any backed-off token score under the
      Laplace unigram ``S1(w) = (c(w)+1)/(N+V)`` (defined for OOV);
    - token i>1 scores ``c(prev,cur)/c(prev)`` when the bigram was
      seen in the reference, else ``alpha * S1(cur)`` (Stupid
      Backoff's relative frequency + fixed backoff penalty — scores,
      not normalized probabilities, exactly as published).

    Per-token bits are DECIMAL(18,12)-cast before the per-doc SUM
    (order-free reduction, registry determinism rule 1); the output
    is ``(id, n_tok, bits_per_token)`` rounded to 6.

    Scale: the LM tables are reference-corpus-bounded — broadcast by
    default (the CCNet case: a Wikipedia-sized LM vs a 100 TB crawl);
    ``broadcast_lm=False`` degrades to a shuffle join for an LM too
    big for executor memory.  The corpus side is one JVM-side pair
    explode + three LM joins + one doc-keyed combinable aggregate;
    the corpus text is never shuffled.
    """
    side = F.broadcast if broadcast_lm else (lambda d: d)
    uni = lm.where(F.col("prev").isNull()).select("cur", "c")
    bi = lm.where(F.col("prev").isNotNull())
    tot = uni.agg(F.sum("c").cast("double").alias("n"),
                  F.count(F.lit(1)).cast("double").alias("v"))

    # tokens materialized once per row before the pair lambda (the
    # q177 quadratic-retokenization catch — optimization round 15)
    toks = F.col("__toks")
    grid = (df.select(
        F.col(id_col),
        textfns.whitespace_tokens(text_col).alias("__toks"))
        .select(
        F.col(id_col),
        F.explode(F.transform(
            toks,
            lambda x, i: F.struct(
                F.when(i > 0, F.element_at(toks, i)).alias("prev"),
                x.alias("cur")),
        )).alias("p"))
        .select(id_col, F.col("p.prev").alias("prev"),
                F.col("p.cur").alias("cur")))

    j = (grid
         .join(side(bi.select("prev", "cur",
                              F.col("c").alias("c_bi"))),
               ["prev", "cur"], "left")
         .join(side(uni.select(F.col("cur").alias("prev"),
                               F.col("c").alias("c_prev"))),
               "prev", "left")
         .join(side(uni.select("cur", F.col("c").alias("c_cur"))),
               "cur", "left")
         .crossJoin(F.broadcast(tot)))
    s1 = ((F.coalesce(F.col("c_cur"), F.lit(0)).cast("double") + 1.0)
          / (F.col("n") + F.col("v")))
    s = (F.when(F.col("prev").isNotNull() & F.col("c_bi").isNotNull(),
                F.col("c_bi").cast("double") / F.col("c_prev"))
         .when(F.col("prev").isNotNull(), F.lit(alpha) * s1)
         .otherwise(s1))
    term = (-F.log(s) / F.lit(ln2)).cast("decimal(18,12)")
    return (j.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tok"),
                 F.round(F.sum(term).cast("double")
                         / F.count(F.lit(1)), 6).alias("bits_per_token")))


def topgram_report(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   ns: tuple[int, ...] = (2, 3, 4)) -> DataFrame:
    """Gopher top-n-gram repetition report (round 15, X79; Rae et
    al. 2021's "fraction of characters in the most common n-gram"
    rule family, on the token grid): per document and per n, the most
    frequent n-gram, its occurrence count, and the fraction of the
    document's tokens its occurrences cover — the repetition signal
    `repetition_stats`' duplicate-bigram fraction can't localize (a
    boilerplate header repeated 50 times is ONE gram at a huge
    fraction; 50 distinct near-dupes are many grams at tiny
    fractions).  Docs shorter than n tokens have no n-row.

    Ties break (count DESC, gram ASC) via one combinable
    ``min(struct(-count, gram))`` — no window, integer/string
    arithmetic end-to-end (the only double is the final round-6
    fraction), so the row is hash-exact cross-engine regardless of
    plan shape.  Scale: the gram grid is built JVM-side in ONE scan
    (all n at once, `transform` + `slice` — no posexplode join), then
    one (doc, n, gram)-keyed combinable count and one (doc, n)-keyed
    combinable argmin — shuffles carry gram-sized rows, never the
    document text.

    The token array is MATERIALIZED once per row (``__toks``) before
    the gram lambdas reference it (optimization round 15, guide §1.2
    per-task work): higher-order-function lambdas are interpreted
    without common-subexpression elimination, so an inline
    ``whitespace_tokens`` expression re-ran the regex+split once per
    GRAM POSITION — O(n_tok²) re-tokenization per document (measured
    10× on the gram grid alone: 13.3 s → 1.3 s at sf0.1)."""
    df = df.select(F.col(id_col),
                   textfns.whitespace_tokens(text_col).alias("__toks"))
    toks = F.col("__toks")
    n_tok = F.size(toks)

    def _tier(n: int):
        # factory scope binds n: pyspark HOF lambdas must take exactly
        # (x) or (x, i) — a default-arg third parameter breaks arity
        # inspection
        return F.when(n_tok >= n, F.transform(
            F.slice(toks, 1, n_tok - (n - 1)),
            lambda x, i: F.struct(
                F.lit(int(n)).alias("n"),
                F.concat_ws(" ", F.slice(toks, i + 1, F.lit(int(n))))
                .alias("gram")),
        )).otherwise(F.expr("array()")
                     .cast("array<struct<n:int,gram:string>>"))

    tiers = [_tier(int(n)) for n in ns]
    flat = (df.select(F.col(id_col), n_tok.alias("n_tok"),
                      F.explode(F.flatten(F.array(*tiers))).alias("g"))
            .select(id_col, "n_tok", F.col("g.n").alias("n"),
                    F.col("g.gram").alias("gram")))
    counts = (flat.groupBy(id_col, "n_tok", "n", "gram")
              .agg(F.count(F.lit(1)).alias("c")))
    return (counts.groupBy(id_col, "n_tok", "n")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                F.col("gram").alias("g"))).alias("b"))
            .select(id_col, "n", F.col("b.g").alias("top_gram"),
                    (-F.col("b.nc")).cast("long").alias("occurrences"),
                    F.round(((-F.col("b.nc")) * F.col("n"))
                            .cast("double") / F.col("n_tok"), 6)
                    .alias("token_frac")))
