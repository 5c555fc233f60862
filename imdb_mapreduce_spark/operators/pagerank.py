"""PageRank as iterative DataFrame joins — the second iterative algorithm
in the engine (alongside ``operators/components.py``).

Execution shape per iteration: one join (ranks onto the degree-annotated
edge table) + one aggregation (contributions per destination), both
shuffling on the node key — the minimal shuffle set for distributed
PageRank. Lineage is truncated with ``localCheckpoint`` every few rounds
(the same discipline as BFS/components: an unbounded iterative plan DAG is
what kills iterative Spark jobs at scale, not the math).

100 TB posture:
- the edge table is degree-annotated ONCE and cached — per-iteration work
  touches only (node, rank) tuples beyond it;
- no driver-side state but two scalar counts (N, and the convergence
  probe if enabled); ranks never ``collect()``;
- a bucketed edge layout on the src key (``sources/storage``) removes the
  per-iteration edge-side shuffle entirely, leaving only the rank-side
  exchange — the same co-location trick the BFS tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Ranks after a FIXED number of power iterations (deterministic runs
    beat adaptive stopping for reproducible corpus builds; pair with the
    scalar checksum probe from ``components.py`` if convergence stopping
    is wanted). Returns (node, rank).

    Dangling nodes (no out-edges) contribute nothing — the standard
    simplification; symmetrized graphs have none.
    """
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    deg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
    ed = e.join(deg, "_src").persist()
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .persist()
    )
    try:
        n = nodes.count()  # bounded driver value: one scalar
        base = (1.0 - damping) / n
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        for i in range(iterations):
            contribs = (
                ed.join(ranks, ed._src == ranks.node)
                .select("_dst", (F.col("rank") / F.col("_deg")).alias("_c"))
                .groupBy("_dst")
                .agg(F.sum("_c").alias("_contrib"))
            )
            ranks = (
                nodes.join(contribs, nodes.node == contribs._dst, "left")
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.lit(damping) * F.coalesce(F.col("_contrib"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
            if (i + 1) % checkpoint_every == 0:
                ranks = ranks.localCheckpoint(eager=True)
        return ranks.localCheckpoint(eager=True)
    finally:
        ed.unpersist()
        nodes.unpersist()
