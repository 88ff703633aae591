"""Time a list of registry queries at two SF dirs (default sf0.1 vs the
x10 replica from tools/scale_stress.py) and print per-query ratios —
the per-round helper that feeds STRESS_X10.md.

Usage: python tools/stress_new.py q94_shipping_priority q95_... [--x10 /tmp/sfx10]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_iot_data_pipeline_project_spark import registry  # noqa: E402
from real_time_iot_data_pipeline_project_spark.session import get_spark  # noqa: E402

REPEATS = 3


def time_query(spark, name, sf_dir):
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.monotonic()
        df = registry.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def main():
    argv, args, x10 = sys.argv[1:], [], "/tmp/sfx10"
    i = 0
    while i < len(argv):
        if argv[i] == "--x10":
            if i + 1 >= len(argv):
                sys.exit("--x10 requires a directory argument")
            x10 = argv[i + 1]
            i += 2
        else:
            args.append(argv[i])
            i += 1
    spark = get_spark(app_name="stress-new")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    spark.read.parquet("/root/testdata/sf0.1/region.parquet").count()
    # RESULT prefix + flush: Spark progress bars interleave \r fragments
    # on stdout — consumers should `tr '\r' '\n' | grep RESULT`
    print(f"RESULT {'query':34s} {'sf0.1':>7s} {'x10':>7s} {'ratio':>6s}",
          flush=True)
    for name in args:
        a = time_query(spark, name, "/root/testdata/sf0.1")
        b = time_query(spark, name, x10)
        print(f"RESULT {name:34s} {a:7.2f} {b:7.2f} {b / a:5.1f}x",
              flush=True)


if __name__ == "__main__":
    main()
