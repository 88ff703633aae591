"""sf1-scale stress harness: replicate the sf0.1 testdata ~10x with
key remapping and run the headline bench against it, so the quadratic-
stage queries (winnowing overlap, LSH pairs) and the iterative CC loop
reveal their constants before a real cluster does.

Replication is NOT naive duplication — that would plant 10 exact copies
of every document and turn every near-dup query quadratic by
construction, measuring an artifact instead of the algorithm:

- fact keys (event_id, doc_id, vec_id, *_orderkey) are offset per
  replica so keys stay unique;
- document text gets a per-replica Caesar rotation of the alphabet
  (``translate`` — a character bijection with period 26, so no two
  replicas coincide), preserving every within-replica
  length/token/shingle statistic while making cross-replica letter
  shingles disjoint, so near-dup structure scales linearly like a real
  corpus (digit/punctuation/whitespace k-grams still collide across
  replicas — the boilerplate-like tail a real corpus also has);
- embeddings are cyclically rotated per replica (norm-preserving,
  different neighbor structure);
- dims (region/nation/customer/supplier/part) are copied unscaled —
  at 100 TB facts grow and dims don't, which also grows per-key join
  fan-out exactly the way production growth does.

Usage:
  python tools/scale_stress.py [out_dir] [factor]      # default /tmp/sfx10, 10
  SPARK_GRAFT_SF_DIR=/tmp/sfx10 python bench.py        # then stress-bench

Writes outside the repo (out_dir); never touches /root/testdata.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from real_time_iot_data_pipeline_project_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
ALPHA = "abcdefghijklmnopqrstuvwxyz"
DIMS = ["region", "nation", "customer", "supplier", "part"]


def _rot_alpha(i: int) -> str:
    # Caesar rotation of the full alphabet: bijective per replica,
    # period 26 > any sane factor, so no two replicas share text (a
    # 5-letter vowel rotation had period 5 — replicas i and i+5 came
    # out IDENTICAL, planting exactly the exact-dup artifact this
    # harness exists to avoid)
    r = i % len(ALPHA)
    return ALPHA[r:] + ALPHA[:r]


def _replicas(df: DataFrame, factor: int, build) -> DataFrame:
    out = build(df, 0)
    for i in range(1, factor):
        out = out.unionByName(build(df, i))
    return out


def scale_table(spark, name: str, factor: int) -> DataFrame:
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    if name in DIMS:
        return df
    if name == "events":
        off = df.agg(F.max("event_id")).head()[0] + 1
        return _replicas(df, factor, lambda d, i: d.withColumn(
            "event_id", F.col("event_id") + F.lit(i * off)))
    if name == "documents":
        off = df.agg(F.max("doc_id")).head()[0] + 1
        return _replicas(df, factor, lambda d, i: d.select(
            (F.col("doc_id") + F.lit(i * off)).alias("doc_id"),
            F.translate("text", ALPHA + ALPHA.upper(),
                        _rot_alpha(i) + _rot_alpha(i).upper()).alias("text"),
            "lang", "source", "n_chars"))
    if name == "embeddings":
        off = df.agg(F.max("vec_id")).head()[0] + 1
        dim = len(df.select("embedding").head()[0])
        return _replicas(df, factor, lambda d, i: d.select(
            (F.col("vec_id") + F.lit(i * off)).alias("vec_id"),
            F.expr(
                f"concat(slice(embedding, {(i % dim) + 1}, {dim - (i % dim)}),"
                f" slice(embedding, 1, {i % dim}))").alias("embedding"),
            "label"))
    if name in ("orders", "lineitem"):
        key = "o_orderkey" if name == "orders" else "l_orderkey"
        off = (spark.read.parquet(f"{SRC}/orders.parquet")
               .agg(F.max("o_orderkey")).head()[0] + 1)
        return _replicas(df, factor, lambda d, i: d.withColumn(
            key, F.col(key) + F.lit(i * off)))
    raise ValueError(name)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    tables = DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        scaled = scale_table(spark, t, factor)
        scaled.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"{t}: {spark.read.parquet(f'{out_dir}/{t}.parquet').count()} rows")


if __name__ == "__main__":
    main()
