"""Multinomial Naive Bayes text classification (X53): the counting
classifier that covers the fastText-tier jobs of a training-data
pipeline — language ID beyond the stopword heuristic, topic/domain
tagging, seed-vs-rest quality filtering (the GPT-3 §A quality
classifier shape) — with training = one grouped count and inference =
one broadcast join + a decimal-exact log-sum argmax.  McCallum &
Nigam 1998 ("A Comparison of Event Models for Naive Bayes Text
Classification") is the standard reference for the multinomial event
model used here.

Cross-engine determinism (the q72/q147 ln policy, generalized to n
classes): every per-token term ln((c+1)/(T_c+V)) and the prior term
ln((n_c+1)/(N+L)) is the identical expression tree in both engines,
cast to DECIMAL(18,12) BEFORE the per-(doc, label) sum — decimal sums
are order-free, so scores cannot depend on partitioning — and the
argmax tie-break is (score DESC, label DESC), total.  Add-one
smoothing over the shared training vocabulary keeps every class a
proper distribution over the same support (the q147 convention).

Scale shape: training is one explode + one partial-aggregatable
groupBy (vocab×L rows — the model IS that table; persist it like the
dedup tier's signature store).  Classification explodes the test
corpus once, fans each token across the L-row broadcast label dim,
joins the broadcast model on (tok, label), and reduces doc-keyed —
text never shuffles, no corpus-sized exchange keyed by token.

Reference parity: the reference has no classifier tier; this is the
training-data extension layer (SURVEY.md §2 X53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textfns


def nb_train(df: DataFrame, label_col: str = "label",
             text_col: str = "text") -> DataFrame:
    """Token-count model: one row per (label, tok) with its count.
    Training a Naive Bayes IS this table — everything else
    (smoothing, totals, vocabulary, priors) derives from it and the
    labeled doc counts at classify time."""
    return (df.select(F.col(label_col).alias("label"),
                      F.explode(textfns.whitespace_tokens(text_col))
                      .alias("tok"))
            .groupBy("label", "tok")
            .agg(F.count(F.lit(1)).alias("c")))


def nb_doc_counts(df: DataFrame, label_col: str = "label") -> DataFrame:
    """(label, n_docs) — the prior's numerator, one tiny groupBy."""
    return (df.groupBy(F.col(label_col).alias("label"))
            .agg(F.count(F.lit(1)).alias("n_docs")))


def nb_classify(docs: DataFrame, counts: DataFrame,
                doc_counts: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                broadcast_model: bool = True,
                with_margin: bool = False) -> DataFrame:
    """Argmax-posterior classification of ``docs`` under a trained
    model (``counts`` from :func:`nb_train`, ``doc_counts`` from
    :func:`nb_doc_counts`).

    score(d, c) = ln (n_c+1)/(N+L)  +  Σ_{t∈d} ln (cnt(c,t)+1)/(T_c+V)

    with V = the training vocabulary size and every term decimal-cast
    pre-sum (order-free).  A token unseen in training still
    contributes the smoothed floor per class — finite, never −∞.
    Returns (id_col, label, score) — the winning label per doc with
    its rounded log-posterior; ties break toward the
    lexicographically LARGEST label (max_by struct order, mirrored in
    the oracle).  ``with_margin`` adds ``margin`` = best minus
    second-best log-posterior (the X25 lang_confidence shape at
    classifier tier; decimal-exact, rounded to 6 dp, NULL for a
    single-label model) so curation can route low-confidence docs to
    review instead of hard-assigning.

    SIZE CONTRACT — ``broadcast_model``: the model table is vocab×L
    rows.  The default broadcast join is right for the lang-ID /
    quality-filter jobs this operator exists for (L ~ 10^1-10^2 over
    a Zipf-bounded shared vocabulary: tens of MB).  For large label
    spaces (a 10^4-label topic tagger), L·vocab exceeds the broadcast
    comfort zone — pass ``broadcast_model=False`` to join the model
    by shuffle-hash on ``(tok, label)`` instead.  Predictions are
    IDENTICAL either way (the per-(doc,label) sum is decimal, hence
    order- and partitioning-free; pinned by test) — the flag only
    picks the physical join."""
    totals = (counts.groupBy("label").agg(F.sum("c").alias("t")))
    consts = F.broadcast(
        counts.select("tok").distinct()
        .agg(F.count(F.lit(1)).alias("v"))
        .crossJoin(doc_counts.agg(
            F.sum("n_docs").alias("n"),
            F.count(F.lit(1)).alias("l"))))
    labels = F.broadcast(
        totals.join(doc_counts, "label")
        .crossJoin(consts)
        .select("label", "t", "v",
                F.log((F.col("n_docs").cast("double") + F.lit(1.0))
                      / (F.col("n") + F.col("l")).cast("double"))
                .cast("decimal(18,12)").alias("prior")))
    toks = docs.select(
        F.col(id_col),
        F.explode(textfns.whitespace_tokens(text_col)).alias("tok"))
    term = F.log(
        (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(1.0))
        / (F.col("t") + F.col("v")).cast("double")
    ).cast("decimal(18,12)")
    model = (F.broadcast(counts) if broadcast_model
             else counts.hint("shuffle_hash"))
    scored = (
        toks.crossJoin(labels.select("label", "t", "v", "prior"))  # ×L
        .join(model, ["tok", "label"], "left")
        .groupBy(id_col, "label", "prior")
        .agg(F.sum(term).alias("__tok_sum"))
        .select(id_col, "label",
                (F.col("prior") + F.col("__tok_sum")).alias("__score"))
    )
    aggs = [F.expr("max_by(label, struct(__score, label))")
            .alias("label"),
            F.round(F.max(F.struct("__score", "label"))["__score"]
                    .cast("double"), 6).alias("score")]
    if with_margin:
        # decimal-exact best-minus-second-best under the SAME total
        # order as the argmax (so margin 0 means a genuine tie that
        # broke lexicographically).  collect_list is L-sized per doc —
        # bounded by the label space, the same L the ×L fan already
        # carries; NULL margin for a single-label model.
        top2 = F.slice(
            F.sort_array(F.collect_list(F.struct("__score", "label")),
                         False), 1, 2)
        aggs.append(
            F.when(F.size(top2) >= 2,
                   F.round((top2[0]["__score"] - top2[1]["__score"])
                           .cast("double"), 6)).alias("margin"))
    return scored.groupBy(id_col).agg(*aggs)
