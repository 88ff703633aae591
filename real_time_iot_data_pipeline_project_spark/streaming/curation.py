"""Streaming corpus ingestion: the training-data curation pipeline as a
Structured Streaming job.

Batch curation (registry q48) assumes the corpus is at rest; real
corpora arrive continuously (crawl drops, partner feeds). This module
runs the same dedup → annotate → filter chain incrementally:

  file/Kafka doc stream
    → event-time watermark + ``dropDuplicatesWithinWatermark`` keyed by
      the content fingerprint (exact dedup with bounded state — the
      streaming twin of operators.dedup.exact_dedup; duplicates arriving
      within the watermark horizon are dropped, state is evicted after)
    → quality / language / token-count annotation (pure Column exprs —
      the identical expressions the batch path uses, so batch and
      stream agree row-for-row)
    → append parquet partitioned by (ingest_date, lang) for downstream
      partition pruning, exactly-once via checkpoint.

Semantics note: streaming exact-dedup keeps the FIRST-ARRIVING doc per
fingerprint inside the watermark horizon, where batch dedup keeps the
min-id doc globally — the standard batch/stream trade: bounded state
buys horizon-scoped dedup. A periodic batch ``exact_dedup`` compaction
over the sink closes the gap (same winner policy from there on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import textfns

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("event_time", T.TimestampType()),
])


def read_doc_stream(spark, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """S5-twin file source for document JSONL drops (one JSON doc per
    line) — swap for the Kafka reader (streaming.job.read_kafka_stream)
    in production; the transform below is source-agnostic."""
    return (
        spark.readStream.format("json")
        .schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def annotate_and_filter(docs: DataFrame, min_quality: float = 0.45,
                        langs: tuple[str, ...] | None = None) -> DataFrame:
    """The batch-identical annotation + gate chain shared by every
    curation surface (curate_stream, the near-dup foreachBatch sink,
    pipelines.curate_corpus uses the same expressions): quality score,
    language ID, token count, ingest date; keep rows passing the quality
    floor and (when given) the language allowlist."""
    out = (
        docs.withColumn("q", textfns.quality_score("text"))
        .withColumn("detected_lang", textfns.detect_language("text"))
        .withColumn("n_tok", textfns.token_count("text"))
        .withColumn("ingest_date", F.to_date("event_time"))
        .filter(F.col("q") >= min_quality)
    )
    if langs is not None:
        out = out.filter(F.col("detected_lang").isin(*langs))
    return out


def curate_stream(docs: DataFrame, watermark: str = "10 minutes",
                  min_quality: float = 0.45,
                  langs: tuple[str, ...] | None = None) -> DataFrame:
    """Watermarked fingerprint dedup + batch-identical annotation +
    quality gate. Returns the annotated keep-stream.

    ``langs`` mirrors pipelines.curate_corpus: an allowlist of detected
    languages to keep. Default None keeps every language — the sink is
    partitioned by detected_lang, so downstream mix-builders can still
    select languages via partition-pruned reads; pass an explicit tuple
    to make the stream sink row-identical to the batch pipeline's."""
    fp = textfns.fingerprint("text")
    deduped = (
        docs.withColumn("fingerprint", fp)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
    return annotate_and_filter(deduped, min_quality, langs)


def start_near_dedup_corpus_sink(docs: DataFrame, path: str, checkpoint: str,
                                 signature_store: str,
                                 threshold: float = 0.7,
                                 min_quality: float = 0.45,
                                 langs: tuple[str, ...] | None = None,
                                 available_now: bool = False):
    """Streaming ingestion with cross-batch NEAR-dup dedup: each
    micro-batch is near-deduped (dedup.near_dedup_against) against the
    MinHash signature store accumulated from every previously WRITTEN
    doc, then exact-deduped within itself, annotated with the
    batch-identical chain, gated, and appended to the corpus sink; the
    survivors' signatures are appended to the store so later batches
    dedup against them.

    This is the production crawl-increment shape: the corpus text is
    never re-read — each increment costs one banded probe of the
    signature store. foreachBatch because signature computation is a
    grouped aggregation per micro-batch plus a batch join against a
    growing static table, which the continuous-query API cannot express.

    Delivery: the checkpoint makes batch replay deliver the same batch
    ids, but the two appends (corpus + store) are not atomic — a crash
    between them can re-append one on retry (at-least-once). For
    exactly-once, key both writes by batch_id subdirectories as
    warehouse/incremental.py does; kept simple here because the planted
    e2e test exercises semantics, not crash recovery."""
    from ..operators import dedup as dedup_ops

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not batch_df.head(1):
            return
        batch = dedup_ops.exact_dedup(batch_df)
        try:
            base_sigs = spark.read.parquet(signature_store)
        except Exception:  # first batch: store not created yet
            base_sigs = dedup_ops.minhash_signatures(
                spark.createDataFrame([], batch.schema))
        kept = dedup_ops.near_dedup_against(batch, base_sigs,
                                            threshold=threshold)
        written = annotate_and_filter(kept, min_quality, langs).cache()
        (written.write.mode("append")
         .partitionBy("ingest_date", "detected_lang").parquet(path))
        (dedup_ops.minhash_signatures(written)
         .write.mode("append").parquet(signature_store))
        written.unpersist()

    w = (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def start_corpus_sink(curated: DataFrame, path: str, checkpoint: str,
                      available_now: bool = False):
    """Append parquet partitioned (ingest_date, detected_lang): date for
    retention/pruning, language for mix-building reads. Exactly-once via
    the checkpointed file-sink log."""
    w = (
        curated.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .partitionBy("ingest_date", "detected_lang")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
