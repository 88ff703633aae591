"""Streaming LM reference fold (round 15, X81): X75's Stupid-Backoff
bigram LM kept fresh as the REFERENCE corpus grows — the CCNet
scenario where the curated reference itself arrives in batches
(wiki snapshot refreshes, curated-set expansions) while the crawl is
scored continuously.

Why it folds exactly: the trained LM IS one integer table of
(prev, cur) counts (``ngram_lm_train``'s persistable frame — prev
NULL marks the unigram tier), and integer counts are exactly
mergeable — each micro-batch appends its OWN counts under a
batch_id-keyed overwrite directory (the q130/q150/q156 exactly-once
contract: a checkpoint replay rewrites its own partition idempotently
and can never double-count) and the model read sums them.  An LM
folded from ANY batching equals ``ngram_lm_train`` on the
concatenated reference bit-for-bit, so every downstream score is
IDENTICAL — the q179 oracle is literally q173's SQL (the q156
fold==batch precedent at the LM tier).

Scale: per-batch cost is the batch's own two combinable count
aggregates (vocab- and seen-bigram-sized output, never the corpus);
the read is one (prev, cur)-keyed sum over the store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textops import ngram_lm_scores, ngram_lm_train

_LM_SCHEMA = "prev string, cur string, c long"


def process_lm_batch(batch_df: DataFrame, batch_id: int, store: str,
                     text_col: str = "text") -> None:
    """One micro-batch of the reference fold (module-level so the
    replay test and the hash-gated registry query drive it directly
    with pinned batch_ids — the q130/q150 pattern).  Writes the
    batch's OWN (prev, cur) counts; nothing reads the store during a
    fold, so idempotence is the overwrite itself."""
    if not batch_df.head(1):
        return
    (ngram_lm_train(batch_df, text_col=text_col)
     .write.mode("overwrite").parquet(
         f"{store}/counts/batch_id={batch_id}"))


def lm_from_store(spark: SparkSession, store: str) -> DataFrame:
    """The folded LM frame — one partial-aggregatable (prev, cur) sum
    over a pinned-schema read (NULL prev groups as the unigram tier
    on both engines; a crash-mid-first-batch store neither wedges nor
    miscounts)."""
    return (spark.read.schema(_LM_SCHEMA)
            .parquet(f"{store}/counts")
            .groupBy("prev", "cur").agg(F.sum("c").alias("c")))


def ngram_lm_scores_from_store(spark: SparkSession, store: str,
                               docs: DataFrame,
                               text_col: str = "text",
                               id_col: str = "doc_id",
                               alpha: float = 0.4,
                               broadcast_lm: bool = True,
                               ln2: float = 0.6931471805599453
                               ) -> DataFrame:
    """X75's ngram_lm_scores under the stream-folded reference model —
    equals the batch computation on the concatenated reference,
    because the folded integers ARE that model (the q179 hash gate's
    claim)."""
    return ngram_lm_scores(docs, lm_from_store(spark, store),
                           text_col=text_col, id_col=id_col,
                           alpha=alpha, broadcast_lm=broadcast_lm,
                           ln2=ln2)


def start_lm_sink(ref_stream: DataFrame, checkpoint: str, store: str,
                  text_col: str = "text", available_now: bool = True):
    """Attach the fold to a streaming DataFrame via foreachBatch — the
    engine drives process_lm_batch with its own batch_ids (replay
    idempotence by the overwrite contract)."""
    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        process_lm_batch(batch_df, batch_id, store, text_col=text_col)

    writer = (ref_stream.writeStream.outputMode("update")
              .option("checkpointLocation", checkpoint)
              .foreachBatch(_fold))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
