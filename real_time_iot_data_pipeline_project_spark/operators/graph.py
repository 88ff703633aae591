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
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    for _ in range(max_iters):
        neighbor_labels = (
            e.join(labels, e["a"] == labels["id"])
            .select(F.col("b").alias("id"), "component")
        )
        new_labels = (
            labels.union(neighbor_labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
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
    return labels


def dedup_survivors(components: DataFrame) -> DataFrame:
    """Survivor per cluster = the node whose id IS the component label
    (min-id policy, same winner as operators.dedup.exact_dedup)."""
    return components.filter(F.col("id") == F.col("component")).select("id")
