"""Connected components over a pair/edge list — turns near-duplicate
PAIRS into duplicate CLUSTERS (the last step of corpus dedup: keep one
canonical doc per component).

Iterative min-label propagation expressed as DataFrame joins:
label(n) ← min(label(n), min over neighbors m of label(m)), repeated
until a fixpoint. The driver only checks a scalar "did anything
change" per round — data never leaves the cluster. Rounds needed ≈
graph diameter (near-dup clusters are tiny, so 2-4 rounds in
practice); each round is one shuffle on node id.

This is the honest Spark shape for iterative algorithms: a driver loop
over lazy plans with a convergence action, the same pattern GraphX/
GraphFrames uses underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Return (node, component) where component = min node id in the
    connected component. ``edges`` is undirected input (one row per
    pair, any orientation)."""
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct().cache()
    labels = (
        both.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .cache()
    )
    try:
        for _ in range(max_iter):
            neighbor_min = (
                both.join(labels, both["b"] == labels["node"])
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("component").alias("nbr_min"))
            )
            new_labels = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"), F.coalesce("nbr_min", F.col("component"))
                    ).alias("component"),
                )
                .cache()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        else:
            # fell out of the loop with labels still moving: a component
            # whose diameter exceeds max_iter would get WRONG (split)
            # labels — refuse to return silently-unconverged results.
            # unpersist the still-cached frame before raising so repeated
            # failing calls in a long-lived session don't pin blocks.
            labels.unpersist()
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "iterations (a component's diameter exceeds max_iter); "
                "raise max_iter"
            )
    finally:
        both.unpersist()
    return labels
