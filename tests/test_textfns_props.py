"""Bulk property tests for the text-function library: domain invariants
over adversarial inputs (unicode, whitespace extremes, punct-only,
huge/empty) — evaluated in one Spark pass per property, not per-example."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from real_time_iot_data_pipeline_project_spark.functions import textfns


def _corpus(spark, n=300):
    rng = random.Random(13)
    pools = [
        "the and of to in is that it for a ",
        "!!!???;;;:::...,,,---()[]{}",
        "Ünïcödé tëxt ẅith diacritics ",
        "0123456789 42 7 ",
        " \t  \n  ",
        "x",
        "",
        "word " * 250,
    ]
    rows = []
    for i in range(n):
        s = "".join(rng.choice(pools) for _ in range(rng.randint(1, 6)))
        rows.append((i, s))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ratio_and_score_domains(spark):
    df = _corpus(spark).select(
        "doc_id",
        textfns.quality_score("text").alias("q"),
        textfns.punct_ratio("text").alias("pr"),
        textfns.stopword_ratio("text").alias("sr"),
        textfns.token_count("text").alias("n_tok"),
        textfns.bpe_token_count("text").alias("n_bpe"),
    )
    bad = df.filter(
        F.col("q").isNull() | (F.col("q") < 0) | (F.col("q") > 1)
        | F.col("pr").isNull() | (F.col("pr") < 0) | (F.col("pr") > 1)
        | F.col("sr").isNull() | (F.col("sr") < 0) | (F.col("sr") > 1)
        | (F.col("n_tok") < 1)  # split always yields >= 1 token
        | (F.col("n_bpe") < 0)
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_fingerprint_normalization_invariance(spark):
    rows = [
        (1, "Hello   World"), (2, "  hello world  "), (3, "HELLO\tWORLD"),
        (4, "different entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = {r.doc_id: r.fp for r in df.select(
        "doc_id", textfns.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[3]
    assert fps[4] != fps[1]


def test_detect_language_total_function(spark):
    out = _corpus(spark).select(textfns.detect_language("text").alias("lang"))
    langs = {r.lang for r in out.collect()}
    assert langs <= set(textfns.LANG_STOPWORDS) | {"und"}
    assert out.filter(F.col("lang").isNull()).count() == 0


def test_portable_hash60_range_and_stability(spark):
    df = _corpus(spark).select(textfns.portable_hash60("text").alias("h"))
    assert df.filter((F.col("h") < 0) | (F.col("h") >= 2 ** 60)).count() == 0
    a = sorted(r.h for r in df.collect())
    b = sorted(r.h for r in df.collect())
    assert a == b
