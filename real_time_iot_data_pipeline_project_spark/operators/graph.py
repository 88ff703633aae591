"""Iterative graph algorithms on DataFrames — the piece that turns
near-dup PAIRS into dedup DECISIONS.

``connected_components``: min-label propagation. Every node starts
labeled with its own id; each round, every node takes the min label
among itself and its neighbors; converged when no label changes. The
component label is therefore the MIN node id in the component —
deterministic, engine-independent, and exactly what a dedup survivor
policy wants ("keep the lowest doc_id of each near-dup cluster").

Scale notes:
- one join + one groupBy per round; rounds = graph diameter. LSH
  near-dup clusters are near-cliques (diameter ~2), so 2-4 rounds in
  practice — this is NOT the n-round propagation of a long path graph.
- ``localCheckpoint`` after each round cuts the lineage so the plan
  doesn't grow linearly with iterations (the classic iterative-Spark
  trap). Labels are deterministic, so recomputation-on-failure is safe.
- the driver-side loop only reads a converged-or-not COUNT per round —
  control flow, not data collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(nodes: DataFrame, edges: DataFrame,
                         id_col: str = "id", src_col: str = "id_a",
                         dst_col: str = "id_b", max_iters: int = 25) -> DataFrame:
    """(id, component) for every node; component = min node id reachable.

    ``nodes``: one column ``id_col`` (all nodes, including isolated ones).
    ``edges``: undirected pairs in ``src_col``/``dst_col`` (one direction
    is enough — mirrored internally).
    """
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    # Only edge ENDPOINTS can ever change label — an isolated node keeps
    # component = id by definition. Iterate over the (near-dup graph
    # sized) endpoint set, not the corpus-sized node set: at scale the
    # candidate-pair graph is orders of magnitude smaller than the
    # corpus, so the per-round shuffles must not touch the full corpus.
    touched = e.select(F.col("a").alias("id")).distinct().localCheckpoint()
    labels = touched.withColumn("component", F.col("id"))
    for _ in range(max_iters):
        # Pre-aggregate the min neighbor label per node BEFORE joining
        # back, and carry the previous label through the checkpoint so
        # convergence is a filter over already-materialized rows — the
        # eager localCheckpoint and the changed-count share one job
        # instead of the count re-joining two label tables.
        nbmin = (
            e.join(labels, e["a"] == labels["id"])
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("component").alias("nbmin"))
        )
        new_labels = (
            labels.join(nbmin, "id", "left")
            .select(
                "id",
                # least() skips nulls: isolated nodes keep their label
                F.least("component", "nbmin").alias("component"),
                F.col("component").alias("prev"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("component") != F.col("prev")).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    else:
        # Silent non-convergence would return labels that violate the
        # documented min-id semantics (long chains > max_iters hops).
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"iterations ({changed} labels still changing); raise "
            "max_iters or use a large-star/small-star variant for "
            "high-diameter graphs"
        )
    # isolated nodes re-enter lazily (no per-round cost): component = id.
    # shuffle_hash, not sort-merge: the corpus side must not be sorted,
    # and the endpoint side may exceed broadcast size at scale.
    isolated = (
        nodes.select(F.col(id_col).alias("id"))
        .join(touched.hint("shuffle_hash"), "id", "left_anti")
        .withColumn("component", F.col("id"))
    )
    return labels.union(isolated)


def dedup_survivors(components: DataFrame) -> DataFrame:
    """Survivor per cluster = the node whose id IS the component label
    (min-id policy, same winner as operators.dedup.exact_dedup)."""
    return components.filter(F.col("id") == F.col("component")).select("id")
