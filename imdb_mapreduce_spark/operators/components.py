"""Connected components via min-label propagation — the duplicate-cluster
builder (union-find over near-dup pairs is how pairwise dedup results
become keep/drop decisions in a training-data pipeline).

Iterative driver loop like the BFS (SURVEY.md §3.1 pattern): each round is
a join + min-aggregate, localCheckpoint keeps lineage flat, convergence =
no label changed. Rounds needed = graph diameter in the worst case ≈
O(log n) for typical dup clusters (they are small and dense).

At 100 TB: this is the standard large-graph CC shape (the same algorithm
GraphFrames/GraphX use); for pathological diameters switch to the
large-star/small-star variant — same join/agg primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component
    id = minimum node label in the component. Nodes are compared with
    their natural ordering (use consistent types)."""
    fwd = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = fwd.unionByName(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # neighbor labels flow along edges; every node keeps its own too
        msgs = (
            edges.join(labels, edges["a"] == labels["node"], "inner")
            .select(F.col("b").alias("node"), F.col("label"))
        )
        new_labels = (
            labels.select("node", "label")
            .unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(
                F.broadcast(labels.select("node", F.col("label").alias("_old"))),
                "node",
            )
            .filter(F.col("label") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))