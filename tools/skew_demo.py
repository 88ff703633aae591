"""Planted-skew end-to-end demonstration (VERDICT r6 item 7): the full
decision loop q105's skew report feeds, measured both where salting
WINS and where it LOSES.

Scenario A — the textbook salted-join case: one whale key owns ~30% of
fact rows, the dim is 1 row/key (small but broadcast is disabled — at
demo scale every dim broadcasts, which is itself branch 0 of the
decision rule), and each joined row pays a real per-row cost (a chained
sha2 pipeline, standing in for the scoring/featurizing work a 100 TB
join feeds). The whale's reducer is the critical path; salting spreads
it across `salt` reducers at the negligible price of replicating a tiny
dim.

Scenario B — the counter-case the same harness exposes: a FAT dim
(hundreds of rows per key, so join fan-out does the damage). Salting
must replicate the whole fat dim ×salt through the shuffle+sort, and
that cost exceeds the straggler it removes — plain/AQE win. Measured
in the sweep below (see STRESS_X10.md round-7 section): salted gets
*slower* as salt grows.

Three strategies per scenario, identical resources, row-count-asserted:
plain shuffle join (AQE off) / salted join (q50's operator) / AQE
skew-join.

Usage: python tools/skew_demo.py [x10_dir]   (default /tmp/sfx10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from real_time_iot_data_pipeline_project_spark.operators.analytics import (  # noqa: E402
    salted_join,
)
from real_time_iot_data_pipeline_project_spark.session import get_spark  # noqa: E402

WHALE_SHARE = 0.3   # fraction of fact rows remapped to the whale key
HASH_CHAIN = 8      # per-joined-row work (chained sha2 rounds)
FAT_DIM_ROWS = 500  # scenario-B fan-out per key
REPEATS = 3


def heavy(col: F.Column) -> F.Column:
    for _ in range(HASH_CHAIN):
        col = F.sha2(col, 256)
    return col


def build_fact(spark, x10_dir: str):
    ev = spark.read.parquet(f"{x10_dir}/events.parquet")
    return ev.select(
        F.when(F.pmod(F.col("event_id"), F.lit(10)) < int(WHALE_SHARE * 10),
               F.lit(-1)).otherwise(F.col("user_id")).alias("user_id"),
        "event_id", "value",
    ).localCheckpoint(eager=True)


def diagnose(spark, fact) -> None:
    """The q105-style pre-flight the decision rule consumes."""
    per_key = fact.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = per_key.agg(F.count(F.lit(1)).alias("n_keys"),
                      F.sum("n").alias("n_rows"))
    top = (per_key.crossJoin(F.broadcast(tot))
           .select("user_id", "n",
                   F.round(F.col("n") / F.col("n_rows"), 4).alias("share"),
                   F.round(F.col("n") * F.col("n_keys") / F.col("n_rows"), 1)
                   .alias("skew_factor"))
           .orderBy(F.col("n").desc()).limit(3).collect())
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    print(f"RESULT diagnosis: shuffle_partitions={parts}, "
          f"fair_share={1 / parts:.4f}", flush=True)
    for r in top:
        print(f"RESULT   key={r['user_id']:6d} n={r['n']:7d} "
              f"share={r['share']} skew_factor={r['skew_factor']}",
              flush=True)


def run(spark, label, fact, dim, *, aqe: bool, salted: bool,
        heavy_work: bool = True):
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
    # thresholds tuned down so AQE recognizes the whale partition as
    # skewed at this (tiny, by cluster standards) demo scale
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    best, n = float("inf"), None
    for _ in range(REPEATS):
        t0 = time.monotonic()
        if salted:
            j = salted_join(fact, dim.withColumnRenamed("user_id", "d_user"),
                            "user_id", "d_user", salt=8)
        else:
            j = fact.join(dim, "user_id")
        if heavy_work:
            scored = j.select(
                heavy(F.concat_ws(",", F.col("event_id"), F.col("value"),
                                  F.col("dim_payload"))).alias("h"))
            row = scored.groupBy().agg(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(F.length("h") == 64, 1)).alias("chk"),
            ).collect()[0]
            assert row["chk"] == row["n"]
        else:
            # fan-out scenario: the 500M-row join output IS the work;
            # aggregate real payload from both sides (an empty
            # projection would let codegen skip materialization)
            row = j.groupBy().agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value") * F.col("dim_payload")).alias("chk"),
            ).collect()[0]
        n = row["n"]
        best = min(best, time.monotonic() - t0)
    print(f"RESULT {label:28s} {best:7.2f} s   rows={n}", flush=True)
    return best, n


def main() -> None:
    x10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    spark = get_spark(app_name="skew-demo")
    spark.sparkContext.setLogLevel("ERROR")
    fact = build_fact(spark, x10)
    diagnose(spark, fact)
    keys = fact.select("user_id").distinct()

    print("RESULT -- scenario A: thin dim (1 row/key), per-row-heavy join",
          flush=True)
    thin = keys.withColumn("dim_payload", F.col("user_id") * 100
                           ).localCheckpoint(eager=True)
    t_plain, n1 = run(spark, "A plain shuffle join", fact, thin,
                      aqe=False, salted=False)
    t_salt, n2 = run(spark, "A salted join (salt=8)", fact, thin,
                     aqe=False, salted=True)
    t_aqe, n3 = run(spark, "A AQE skew-join", fact, thin,
                    aqe=True, salted=False)
    assert n1 == n2 == n3, (n1, n2, n3)
    print(f"RESULT A speedup over plain: salted {t_plain / t_salt:.1f}x, "
          f"AQE {t_plain / t_aqe:.1f}x", flush=True)

    print(f"RESULT -- scenario B: fat dim ({FAT_DIM_ROWS} rows/key), "
          "fan-out-heavy join", flush=True)
    fat = (keys.withColumn(
        "slot", F.explode(F.sequence(F.lit(0), F.lit(FAT_DIM_ROWS - 1))))
        .withColumn("dim_payload", F.col("user_id") * 1000 + F.col("slot"))
        .localCheckpoint(eager=True))
    b_plain, m1 = run(spark, "B plain shuffle join", fact, fat,
                      aqe=False, salted=False, heavy_work=False)
    b_salt, m2 = run(spark, "B salted join (salt=8)", fact, fat,
                     aqe=False, salted=True, heavy_work=False)
    b_aqe, m3 = run(spark, "B AQE skew-join", fact, fat,
                    aqe=True, salted=False, heavy_work=False)
    assert m1 == m2 == m3, (m1, m2, m3)
    print(f"RESULT B speedup over plain: salted {b_plain / b_salt:.1f}x, "
          f"AQE {b_plain / b_aqe:.1f}x", flush=True)


if __name__ == "__main__":
    main()
