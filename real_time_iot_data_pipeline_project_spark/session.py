"""SparkSession factory.

One place to encode the scale-aware defaults every job in this engine
relies on:

- AQE on (runtime coalesce, skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong; AQE re-plans per stage.
- Arrow on — every Pandas-UDF boundary (EWMA, multimodal decode) moves
  data in columnar batches instead of pickled rows.
- Session timezone pinned to UTC — the reference mixes tz-aware and naive
  timestamps (SURVEY.md §1.2); pinning the session removes an entire class
  of environment-dependent drift between dev and cluster.
- Shuffle partitions default sized for local[32] testing; on a real
  cluster pass ``shuffle_partitions`` ≈ 2-3× total cores (AQE coalesces
  the excess).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Python workers (mapInPandas / applyInPandas) import this package by name;
# driver-side sys.path edits don't propagate to them, so export the package
# root on PYTHONPATH before the JVM forks workers. Makes every entry point
# runnable from any cwd. On a real cluster, ship the package with --py-files.
_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _PKG_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _PKG_ROOT + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _PKG_ROOT
    )


def get_spark(
    app_name: str = "real-time-iot-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession with engine defaults."""
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{DEFAULT_CPUS}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Small dims (station registry, nation/region) must broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
