"""Streaming CDC upsert sink: maintain a latest-state snapshot table
from a changelog stream — the streaming completion of
``warehouse.history.cdc_latest_snapshot`` (q97), and the from-parquet
reconstruction of what Hudi/Delta call MERGE INTO on a stream.

Design (the shapes that survive 100 TB of accumulated state):

- **Bucketed partial rewrite.** The snapshot lives under
  ``bucket=<hash(key) % n_buckets>`` directories. A micro-batch only
  rewrites the buckets its keys hash into — per-trigger cost is
  O(touched state + batch), never O(total state). At scale, set
  ``n_buckets`` so one bucket ≈ a few executor-partitions of state
  (the same sizing logic as shuffle partitions).
- **Latest-wins merge, replay-idempotent by construction.** Existing
  bucket rows and the batch's ops are unioned and folded with
  ``max_by(payload, order_cols)`` — the merge is associative and
  idempotent, so a crash-replayed micro-batch converges to identical
  bytes instead of duplicating or reordering effects.
- **Tombstones are RETAINED, not applied-and-dropped.** A delete is
  stored as a row with ``op = delete_op`` and filtered at read time
  (``read_snapshot``). Dropping it would let ANY later-delivered stale
  upsert resurrect the key; keeping it makes latest-wins correct under
  out-of-order cross-batch delivery (the Kafka-compacted-topic /
  Hudi design). ``compact_snapshot`` purges tombstones older than an
  explicit horizon — the operator's documented GC, mirroring
  curation.compact_corpus.

Wire into a stream with ``job.start_foreach_batch_sink(changelog,
make_cdc_upsert_batch_fn(...), checkpoint=...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .curation import _dir_exists

BUCKET_COL = "__bucket"


def _with_bucket(df: DataFrame, key_cols: list[str], n_buckets: int) -> DataFrame:
    # xxhash64 of the key tuple: stable across sessions/partitionings,
    # cheap JVM-side; pmod keeps negatives in range
    return df.withColumn(
        BUCKET_COL,
        F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(n_buckets))
        .cast("int"))


def _check_bucket_count(spark: SparkSession, snapshot_dir: str,
                        n_buckets: int) -> None:
    """``n_buckets`` is part of the snapshot's on-disk identity: a
    different count re-routes keys to different bucket dirs, so rows
    already stored under the old hashing would silently stop being
    merged against (stale survivors, resurrect-after-delete). Refuse
    loudly instead — re-bucketing is an explicit offline rewrite."""
    if not _dir_exists(spark, snapshot_dir):
        return
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(snapshot_dir)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith(f"{BUCKET_COL}="):
            bucket = int(name.split("=", 1)[1])
            if bucket >= n_buckets:
                raise ValueError(
                    f"snapshot {snapshot_dir!r} has bucket dir {name} but "
                    f"n_buckets={n_buckets}; the bucket count is fixed at "
                    "snapshot creation — rewrite the snapshot offline to "
                    "re-bucket")


def apply_cdc_batch(spark: SparkSession, batch: DataFrame, snapshot_dir: str,
                    key_cols: list[str], order_cols: list[str], op_col: str,
                    n_buckets: int = 16) -> None:
    """Merge one changelog micro-batch into the bucketed snapshot.

    Only buckets containing batch keys are read and rewritten; each
    touched bucket is replaced by latest-wins over (existing rows ∪
    batch ops). ``order_cols`` must totally order ops per key across
    batches (event time + a unique tiebreaker) — that is what makes
    replay AND out-of-order delivery converge."""
    payload = [c for c in batch.columns if c not in key_cols]
    _check_bucket_count(spark, snapshot_dir, n_buckets)
    b = _with_bucket(batch, key_cols, n_buckets)
    # control-flow collect, NOT data collection: ≤ n_buckets small ints
    # deciding which partition dirs to read/overwrite (same class as the
    # 1-row max() read in warehouse.incremental)
    touched = sorted(
        r[BUCKET_COL] for r in b.select(BUCKET_COL).distinct().collect())
    if not touched:
        return
    merged_src = b.filter(F.col(BUCKET_COL).isin(touched))
    existing_dirs = [
        f"{snapshot_dir}/{BUCKET_COL}={t}" for t in touched
        if _dir_exists(spark, f"{snapshot_dir}/{BUCKET_COL}={t}")
    ]
    if existing_dirs:
        # partition dirs read directly lose the partition column;
        # recompute it from the keys (deterministic hash)
        existing = _with_bucket(
            spark.read.parquet(*existing_dirs), key_cols, n_buckets)
        merged_src = merged_src.unionByName(existing)
    merged = (
        merged_src.groupBy(*key_cols, BUCKET_COL)
        .agg(F.max_by(F.struct(*payload), F.struct(*order_cols))
             .alias("__last"))
        .select(*key_cols, BUCKET_COL,
                *[F.col(f"__last.{c}").alias(c) for c in payload])
        # one file per bucket dir unless state is huge; callers with
        # monster buckets should raise n_buckets instead
        .localCheckpoint(eager=True)
    )
    # overwrite ONLY the touched bucket directories (dynamic partition
    # overwrite); untouched buckets are never read or written
    (merged.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(BUCKET_COL)
     .parquet(snapshot_dir))


def make_cdc_upsert_batch_fn(snapshot_dir: str, key_cols: list[str],
                             order_cols: list[str], op_col: str,
                             n_buckets: int = 16):
    """foreachBatch adapter for job.start_foreach_batch_sink."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(batch_df.sparkSession, batch_df, snapshot_dir,
                        key_cols, order_cols, op_col, n_buckets)

    return fn


def read_snapshot(spark: SparkSession, snapshot_dir: str, op_col: str,
                  delete_op: str = "D") -> DataFrame:
    """Current state: stored rows minus retained tombstones."""
    return (spark.read.parquet(snapshot_dir)
            .filter(F.col(op_col) != F.lit(delete_op))
            .drop(BUCKET_COL))


def compact_snapshot(spark: SparkSession, snapshot_dir: str, output_dir: str,
                     op_col: str, horizon_filter: F.Column,
                     delete_op: str = "D") -> int:
    """GC pass: rewrite the snapshot WITHOUT tombstones older than the
    horizon (``horizon_filter`` true = old enough to purge). Purging a
    tombstone forfeits protection against upserts staler than it —
    pick the horizon beyond any plausible delivery delay, exactly like
    a watermark. Out-of-place (same contract as curation
    compact_corpus): callers swap directories after validating. Returns
    rows written."""
    snap = spark.read.parquet(snapshot_dir)
    purge = (F.col(op_col) == F.lit(delete_op)) & horizon_filter
    kept = snap.filter(~purge).localCheckpoint(eager=True)
    n = kept.count()
    (kept.write.mode("overwrite").partitionBy(BUCKET_COL)
     .parquet(output_dir))
    return n
