"""Targeted per-query timing with bench.py's exact methodology (count
action, min of SPARK_GRAFT_BENCH_REPEATS, default 3) — for isolating a
query family during an optimization loop without paying for the full
155-query sweep.

Usage: python tools/minibench.py <query> [...]   (sf dir from
$SPARK_GRAFT_SF_DIR, default sf0.1; prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from real_time_iot_data_pipeline_project_spark import registry  # noqa: E402
from real_time_iot_data_pipeline_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    spark = get_spark(app_name="minibench")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F
    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.groupBy("r_name").agg(F.count(F.lit(1)).alias("n")).count()
    timings = {}
    for name in names:
        fn = registry.QUERIES[name]
        best = float("inf")
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    print(json.dumps({"queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
