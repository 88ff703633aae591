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
    out = (
        deduped.withColumn("q", textfns.quality_score("text"))
        .withColumn("detected_lang", textfns.detect_language("text"))
        .withColumn("n_tok", textfns.token_count("text"))
        .withColumn("ingest_date", F.to_date("event_time"))
        .filter(F.col("q") >= min_quality)
    )
    if langs is not None:
        out = out.filter(F.col("detected_lang").isin(*langs))
    return out


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
