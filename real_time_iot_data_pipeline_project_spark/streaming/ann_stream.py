"""Streaming vector-index ingestion (round 14, X65): the IVF(-PQ)
store kept fresh as embeddings ARRIVE — the serving-side twin of the
corpus-curation folds (new documents are embedded upstream and their
vectors must become searchable without a rebuild and without
double-ingestion on a checkpoint replay).

Why it folds exactly: ``append_index`` already encodes every increment
against the PINNED stored parameters (centroids, and PQ codebooks when
the tier exists — the X32/X62 contract), and the store's writes are
ingest_id-keyed DYNAMIC partition overwrites.  Pinning
ingest_id = batch_id + 1 (the build holds 0) makes each micro-batch's
write idempotent: a replayed batch rewrites its OWN
(ingest_id, centroid_id) partitions — the q130/q150/q156 batch_id
overwrite contract applied to the index itself.  An index folded from
ANY batching of the increments therefore equals the batch-built index
with the same pinned parameters, search-for-search (q163's gate: the
oracle samples centroids/codebooks from the BASE slice and replays the
search over the full corpus).

Per-batch cost tracks the batch: one broadcast centroid argmax (+ one
broadcast codebook argmin when PQ is on) over the increment, one
partition write.  Nothing reads the store during a fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.ann_index import append_index


def process_index_batch(batch_df: DataFrame, batch_id: int,
                        index_dir: str, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> None:
    """One micro-batch of the index fold (module-level so the replay
    test and the hash-gated registry query drive it directly with
    pinned batch_ids — the q130/q150/q156 pattern).  ingest_id =
    batch_id + 1: the build owns 0, and the engine's batch_ids are
    stable across checkpoint replays, so the overwrite is the
    idempotence."""
    if not batch_df.head(1):
        return
    append_index(batch_df, index_dir, vec_col=vec_col, id_col=id_col,
                 ingest_id=int(batch_id) + 1)


def start_index_append_sink(vec_stream: DataFrame, checkpoint: str,
                            index_dir: str, vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            available_now: bool = True):
    """Attach the fold to a streaming DataFrame via foreachBatch — the
    engine drives process_index_batch with its own batch_ids (replay
    idempotence by the overwrite contract)."""
    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        process_index_batch(batch_df, batch_id, index_dir,
                            vec_col=vec_col, id_col=id_col)

    writer = (vec_stream.writeStream.outputMode("update")
              .option("checkpointLocation", checkpoint)
              .foreachBatch(_fold))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
