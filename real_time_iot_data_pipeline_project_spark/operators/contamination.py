"""Benchmark-contamination screening at probe scale.

The task: given a corpus and a list of eval-set canary strings
("probes"), find every (document, probe) pair where the probe occurs
verbatim in the document's normalized text. A real curation run screens
THOUSANDS of probes over 100 TB — a per-probe ``contains`` OR-chain
(fine for 3 probes, see ``screen_literal_probes``) scales as
O(docs × probes) string scans and recompiles the plan per probe list.

Scale design (``screen_probes``): winnowing-fingerprint intersection.
Both sides are fingerprinted with the SAME winnowing scheme
(operators.dedup.winnow_fingerprints, Schleimer et al.): any shared
substring of length ≥ k + window − 1 (= 8 chars at defaults) is
GUARANTEED to share a selected fingerprint, so a fingerprint equi-join
finds every true hit (no false negatives for probes ≥ 8 normalized
chars). The probe fingerprint dim is tiny (probes × ~probe_len hashes)
→ broadcast; docs are fingerprinted once (persist the fingerprint table
at real scale and screening N probe lists costs N broadcast joins, not
N corpus scans). Hash collisions (60-bit) produce rare false
candidates, removed by an exact ``contains`` verify on ONLY the
candidate pairs — the quadratic step never runs corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textfns
from . import dedup


def screen_literal_probes(docs: DataFrame, probes: list[str],
                          text_col: str = "text") -> DataFrame:
    """Small-list fast path (≲ tens of probes): one codegen'd
    contains-OR chain, pure scan, no shuffle/join. The probe list rides
    the plan like a broadcast dim."""
    norm = textfns.normalize_text(text_col)
    n_hits = None
    for p in probes:
        h = F.when(norm.contains(p), 1).otherwise(0)
        n_hits = h if n_hits is None else n_hits + h
    return docs.withColumn("n_probes_hit", n_hits).filter(F.col("n_probes_hit") > 0)


def screen_probes(docs: DataFrame, probes: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  probe_text_col: str = "probe_text",
                  probe_id_col: str = "probe_id",
                  k: int = dedup.DEFAULT_SHINGLE_K,
                  window: int = 4,
                  min_parallelism: int | None = None) -> DataFrame:
    """Verified (doc_id, probe_id) contamination hits via
    winnowing-fingerprint intersection + exact contains verify.

    Exact semantics (what the oracle checks): hit iff
    ``contains(normalize(doc.text), probe_text)``. Probes must be ≥
    k + window − 1 normalized chars for the no-false-negative guarantee
    (8 at defaults); shorter probes raise."""
    min_len = k + window - 1
    short = probes.filter(
        F.length(textfns.normalize_text(probe_text_col)) < min_len
    ).limit(1).count()
    if short:
        raise ValueError(
            f"probes shorter than {min_len} normalized chars void the "
            "winnowing detection guarantee; lengthen them or lower k/window"
        )
    doc_fps = dedup.winnow_fingerprints(docs, text_col, id_col, k, window,
                                        min_parallelism=min_parallelism)
    probe_fps = dedup.winnow_fingerprints(
        probes, probe_text_col, probe_id_col, k, window
    )
    cands = (
        doc_fps.join(F.broadcast(probe_fps), "fingerprint")
        .select(id_col, probe_id_col)
        .distinct()
    )
    return (
        cands
        .join(docs.select(id_col, textfns.normalize_text(text_col).alias("__norm")),
              id_col)
        .join(F.broadcast(probes.select(probe_id_col, probe_text_col)), probe_id_col)
        .filter(F.col("__norm").contains(F.col(probe_text_col)))
        .select(id_col, probe_id_col)
    )


def synthetic_probe_dim(spark: SparkSession, docs: DataFrame,
                        n_synthetic: int = 1000, probe_len: int = 60,
                        min_text_len: int = 80,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in for a real eval-canary list (no eval sets
    ship in this sandbox): planted probes = verbatim substrings of the
    normalized text of every even-id doc (guaranteed hits), plus
    ``n_synthetic`` md5-hex strings (guaranteed misses). probe_id keeps
    the source doc_id for planted probes; synthetic ids start at 10^6."""
    norm = textfns.normalize_text(text_col)
    planted = (
        docs.filter((F.col(id_col) % 2 == 0) & (F.length(norm) >= min_text_len))
        .select(
            F.col(id_col).cast("long").alias("probe_id"),
            F.substring(norm, 21, probe_len).alias("probe_text"),
        )
    )
    synth = spark.range(n_synthetic).select(
        (F.col("id") + 1_000_000).alias("probe_id"),
        F.md5(F.col("id").cast("string")).alias("probe_text"),
    )
    return planted.unionByName(synth)


def scrub_probe_spans(docs: DataFrame, probes: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      probe_text_col: str = "probe_text",
                      probe_id_col: str = "probe_id",
                      window_tokens: int = 8) -> DataFrame:
    """Decontamination by EXCISION (X5's scrub tier): remove every
    ``window_tokens``-token sliding window of the corpus that appears
    verbatim inside any probe, and keep the REST of each document —
    the Lee et al. 2021 (arXiv:2107.06499) treatment of contaminated
    spans, where drop-the-doc (``screen_probes`` + anti-join, the
    GPT-3 §C policy) throws away an entire document for one quoted
    benchmark sentence.

    Mechanics are X39's excision machinery against the probes' window
    store: probe window hashes (dedup.span_window_hashes over the
    probe text) flag matching doc-grid windows, overlapping flags
    merge into maximal spans, docs reassemble from surviving tokens
    with original case (``cleaned_text``) — so an occurrence of a
    probe spanning ≥ window_tokens aligned tokens is excised in FULL
    at EVERY occurrence (all its internal windows are flagged).  The
    unit is the normalized token grid (the span family's contract):
    probes shorter than ``window_tokens`` tokens contribute no
    windows and scrub nothing — screen them with the char-level
    ``screen_probes`` instead.  Returns q127's with_text schema
    (id, n_tokens, n_tokens_kept, cleaned_fp, cleaned_text).

    Scale shape: the probe store reduces to DISTINCT 32-byte hashes
    (broadcastable dim); the corpus side is one map-side window grid
    + a hash join + the doc-keyed excision window — text never
    shuffles, probes are tokenized once."""
    probe_hashes = dedup.span_window_hashes(
        probes, probe_text_col, probe_id_col, window_tokens)
    base = dedup._span_base(docs, text_col, id_col)
    grid = dedup._window_grid(base, id_col, window_tokens)
    flagged = (grid.join(F.broadcast(probe_hashes.select("wh")
                                     .withColumnRenamed("wh", "__pwh")),
                         F.col("wh") == F.col("__pwh"), "left_semi")
               .select(id_col, "pos"))
    return dedup._excise_spans(base, flagged, id_col, window_tokens,
                               with_text=True)


def semantic_decontam_hits(docs, probes, threshold: float = 0.8,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           probe_id_col: str = "probe_id",
                           dim: int = 64):
    """Embedding-space contamination screen (round 14, X71): flag
    corpus docs whose hashing-trick embedding is within ``threshold``
    cosine of an eval probe's — the SEMANTIC tier of the
    decontamination family.  Exact n-gram screening (X5's chunk-hash
    overlap / q151's span excision) catches verbatim leakage;
    PARAPHRASED eval items — reworded questions, translated passages,
    boilerplate-stripped copies — share no 8-token chunk and sail
    through, but land near the original in embedding space.  Modern
    decontamination runs both tiers; this is the second.

    Composition of gated rules only: X31's vocabulary-free hashing
    embeddings on BOTH sides (no model artifact to ship or pin; the
    q118 determinism argument — integer sums, exact sqrt, one
    division — makes every vector bit-identical cross-engine) and the
    q37/q39 cosine arithmetic, thresholded on the raw double
    (identical expression trees both engines), reported at 6 dp.
    Returns (doc_id, probe_id, cosine_sim) — one row per flagged
    (doc, probe) pair; feed ``.select(id).distinct()`` to a left_anti
    join to drop, or audit the report directly.

    Scale shape: eval probe sets are BOUNDED (10²–10⁴ rows), so the
    probe embeddings broadcast and the screen is ONE scan-stage
    n·|probes| cosine pass over the corpus embeddings — no shuffle,
    no index required.  At probe counts where that pass is too wide,
    nominate candidates with the X62 store (search_index_pq per
    probe) and use this operator as the exact verification tier on
    the nominated pairs (the q32→q128 candidate/verify precedent)."""
    from pyspark.sql import functions as F

    from .embedding import hashing_embed_dense
    from .similarity import cosine

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    demb = hashing_embed_dense(docs, text_col, id_col, dim)
    pemb = (hashing_embed_dense(probes, text_col, probe_id_col, dim)
            .withColumnRenamed("embedding", "__pvec"))
    cos = cosine(F.col("embedding"), F.col("__pvec"))
    return (demb.crossJoin(F.broadcast(pemb))
            .where(cos >= F.lit(float(threshold)))
            .select(id_col, probe_id_col,
                    F.round(cos, 6).alias("cosine_sim")))


def build_semantic_index(docs, index_dir: str, dim: int = 64,
                         n_centroids: int = 16, pq_m: int = 4,
                         pq_kc: int = 8, text_col: str = "text",
                         id_col: str = "doc_id") -> None:
    """Materialize the X62 store over the corpus' X31 hashing
    embeddings, keyed by doc id — the nomination structure
    :func:`semantic_decontam_ann` searches.  Built ONCE per corpus
    release and amortized across every probe list screened against it
    (the same build-once/serve-many economics as the PQ code tier
    itself); appends ride ``ann_index.append_index`` so a grown
    corpus extends the screen without a rebuild."""
    from .ann_index import build_index
    from .embedding import hashing_embed_dense

    # localCheckpoint: build_index reads its input TWICE (the
    # md5-ordered centroid sample and the assignment write), and the
    # embed pipeline is the dominant corpus-sized stage of this build —
    # without materialization it would tokenize+aggregate the corpus
    # twice (optimization round 16, the q119 embed-once posture)
    demb = hashing_embed_dense(docs, text_col, id_col,
                               dim).localCheckpoint(eager=True)
    build_index(demb, index_dir, n_centroids=n_centroids,
                vec_col="embedding", id_col=id_col,
                pq_m=pq_m, pq_kc=pq_kc)


def semantic_decontam_ann(spark, probes, index_dir: str,
                          threshold: float = 0.8, k: int = 16,
                          nprobe: int = 4, text_col: str = "text",
                          id_col: str = "doc_id",
                          probe_id_col: str = "probe_id",
                          dim: int = 64):
    """ANN-NOMINATED semantic contamination screen (round 15, X72 —
    VERDICT r14 item 2): the two-tier candidate/verify composition the
    X71 docstring prescribes for probe sets too wide for the linear
    n·|probes| pass.  Per probe, :func:`ann_index.search_index_pq`
    over the X62 store (:func:`build_semantic_index`) NOMINATES the
    top-``k`` ADC candidates from codes only; the exact X71 cosine
    rule then VERIFIES exactly those nominated pairs against the
    stored float embeddings — the q32→q128 candidate/verify precedent
    applied to the semantic tier.

    Same output contract as :func:`semantic_decontam_hits`
    (doc_id, probe_id, cosine_sim ≥ threshold, 6 dp), and provably a
    SUBSET of it (verification is the identical cosine threshold on
    identical embeddings — pinned by test); what nomination misses is
    the ADC recall price, measured by
    :func:`semantic_decontam_ann_recall` before picking (nprobe, k).

    Scale shape: probes embed once (bounded); nomination reads m ints
    per vector under the store's DPP pruning (never the float corpus,
    never a re-encode); verification is the X67 refine pattern — the
    k·|probes| nominated pairs broadcast onto one column-pruned read
    of the stored float vectors.  Nothing in the pipeline scans
    docs × probes.

    Determinism: every stage is a gated rule — X31 bit-identical
    embeddings, the X62 probe ranking and ADC arithmetic
    (decimal-exact terms, (adc ASC, id ASC) top-k), the q37 cosine
    thresholded on the raw double — so the hit set is hash-exact
    cross-engine (q170's gate)."""
    from .ann_index import search_index_pq
    from .embedding import hashing_embed_dense
    from .similarity import cosine

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # localCheckpoint: the bounded probe embedding is read by the
    # centroid ranking, the ADC LUT AND the final verify join — three
    # consumers that would each re-run the probe tokenize+aggregate
    # pipeline (a handful of stages per read at bench scale)
    pemb = (hashing_embed_dense(probes, text_col, probe_id_col, dim)
            .withColumnRenamed("embedding", "__pvec")
            .localCheckpoint(eager=True))
    cand = (search_index_pq(spark, index_dir, pemb, k=k, nprobe=nprobe,
                            query_id_col=probe_id_col,
                            query_vec_col="__pvec", id_col=id_col)
            .select(probe_id_col, id_col))
    data = (spark.read.parquet(f"{index_dir}/data")
            .select(F.col(id_col), F.col("embedding")))
    cos = cosine(F.col("embedding"), F.col("__pvec"))
    return (data.join(F.broadcast(cand), id_col)
            .join(pemb, probe_id_col)
            .where(cos >= F.lit(float(threshold)))
            .select(id_col, probe_id_col,
                    F.round(cos, 6).alias("cosine_sim")))


def semantic_decontam_ann_recall(spark, docs, probes, index_dir: str,
                                 threshold: float = 0.8,
                                 nprobe_values: tuple[int, ...] = (1, 4, 16),
                                 k_values: tuple[int, ...] = (4, 16, 64),
                                 text_col: str = "text",
                                 id_col: str = "doc_id",
                                 probe_id_col: str = "probe_id",
                                 dim: int = 64):
    """The sizing curve for X72 (the q138/q152/q157 curve convention
    on the decontamination axis): per (nprobe, k), how many of the
    EXACT screen's hits (:func:`semantic_decontam_hits` — the
    brute-force X71 pass) the nominated screen keeps.  A missed hit
    here is leaked eval contamination, so an operator reads this
    table before trading the linear pass for the index — the recall
    target for decontamination is ~100, not the ~90s ANN search
    tolerates.  All-integer counts; recall_pct is one round-6
    division."""
    exact = (semantic_decontam_hits(docs, probes, threshold=threshold,
                                    text_col=text_col, id_col=id_col,
                                    probe_id_col=probe_id_col, dim=dim)
             .select(id_col, probe_id_col))
    n_exact = exact.count()
    rows = []
    for np_ in nprobe_values:
        for k in k_values:
            got = semantic_decontam_ann(
                spark, probes, index_dir, threshold=threshold, k=int(k),
                nprobe=int(np_), text_col=text_col, id_col=id_col,
                probe_id_col=probe_id_col, dim=dim)
            n_got = got.join(exact, [id_col, probe_id_col],
                             "left_semi").count()
            rows.append((int(np_), int(k), int(n_got), int(n_exact)))
    out = spark.createDataFrame(
        rows, "nprobe int, nominate int, n_hits bigint, n_exact bigint")
    return out.select(
        "nprobe", "nominate", "n_hits", "n_exact",
        F.round(F.col("n_hits") * 100.0
                / F.greatest(F.col("n_exact"), F.lit(1)), 6)
        .alias("recall_pct"))
