"""Bounded-depth BFS over the bipartite movie↔actor graph (SURVEY.md §2.9).

The reference's single interactive query (``/root/reference/src/master/
master.erl:251-288``): given a name and a level k, produce the k-level
co-star graph (actor query) or shared-cast movie graph (movie query).

Semantics preserved exactly (SURVEY.md §3.1):
- each *level* is a TWO-hop expansion whose intermediate hop (the movie when
  querying an actor; the actor when querying a movie) is not added to the
  graph — edges connect same-type entities;
- one GLOBAL visited set: a child discovered once is never re-added (the
  result is a tree rooted at the query name);
- level k performs k−1 expansion rounds (``master.erl:259,271``).

One documented semantic cleanup: the reference attaches a child to whichever
parent its sequential recursion happened to reach first — traversal-order
dependent (``master.erl:295-304``). We attach each child to its MINIMUM
discovering parent (deterministic under any partitioning / parallelism).

Scale posture: the loop is driver-side control flow over fully distributed
joins (same design GraphFrames uses). Each round:
``frontier ⋈ edges ⋈ edges`` (two shuffles on the edge keys; broadcast of
the frontier when small), then a ``left_anti`` against visited. Rounds
``localCheckpoint()`` to truncate the growing lineage — without it the plan
doubles per iteration. With the edge table bucketed on both key columns the
per-round shuffles disappear entirely.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MOVIE = "movie"
ACTOR = "actor"


@dataclass
class BfsResult:
    """Mirror of the reference's reply ``{Vertices, Edges}``
    (``master.erl:261-263``)."""

    root: str
    node_type: str
    edges: DataFrame  # (src, dst, level)
    vertices: DataFrame  # (name,)


def _two_hop(frontier: DataFrame, edges: DataFrame, node_col: str, via_col: str) -> DataFrame:
    """frontier(node) → co-entities: join out on node_col, back on via_col.

    For an actor frontier: actor → titles (via) → co-actors (J5,
    ``master.erl:273-283``). BOTH joins broadcast the frontier-derived side
    (frontier, then frontier×degree), so the big edge table is only ever
    scanned — never shuffled. That is the right plan while the frontier is
    bounded (true for level ≤ 4 queries on real-degree graphs); a frontier
    approaching edge-table size would drop the hints and let AQE shuffle.

    No ``distinct`` here: the caller's per-destination aggregation dedups,
    one exchange instead of two.
    """
    # Fresh column names per side before joining: the frontier shares
    # lineage with the edge table after round 1, and attribute-reference
    # joins would be ambiguous self-joins.
    f = frontier.select(F.col("node").alias("src"))
    e1 = edges.select(F.col(node_col).alias("_n1"), F.col(via_col).alias("_via"))
    hop1 = (
        F.broadcast(f)
        .join(e1, F.col("src") == F.col("_n1"), "inner")
        .select("src", "_via")
    )
    e2 = edges.select(F.col(via_col).alias("_v2"), F.col(node_col).alias("dst"))
    return (
        F.broadcast(hop1)
        .join(e2, F.col("_via") == F.col("_v2"), "inner")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )


def bipartite_bfs(
    edges: DataFrame,
    node_col: str,
    via_col: str,
    root: str,
    level: int = 2,
    checkpoint: bool = True,
) -> BfsResult:
    """Generic k-level same-type expansion over any bipartite edge table
    (G1+G2, J4, J5, A4). ``node_col`` is the queried entity type, ``via_col``
    the intermediate hop. Works for movie↔actor, order↔part, user↔document —
    any two-column relation."""
    spark = edges.sparkSession

    frontier = spark.createDataFrame([(root,)], ["node"])
    visited = frontier
    result_edges = spark.createDataFrame(
        [], "src string, dst string, level int"
    )

    # level k = k-1 expansion rounds (master.erl:259,271).
    for lvl in range(1, level):
        pairs = _two_hop(frontier, edges, node_col, via_col)
        children = (
            pairs.join(
                F.broadcast(visited), pairs["dst"] == visited["node"], "left_anti"
            )
            .groupBy("dst")
            .agg(F.min("src").alias("src"))  # deterministic parent
            .select("src", "dst")
            .withColumn("level", F.lit(lvl))
        )
        if checkpoint:
            # One materialization per round. visited/frontier/result are all
            # unions over already-checkpointed frames, so their lineage stays
            # flat without checkpoints of their own (no plan doubling).
            children = children.localCheckpoint(eager=True)
        if children.isEmpty():
            break
        result_edges = result_edges.unionByName(children)
        new_nodes = children.select(F.col("dst").alias("node"))
        visited = visited.unionByName(new_nodes)
        frontier = new_nodes

    vertices = (
        result_edges.select(F.col("src").alias("name"))
        .unionByName(result_edges.select(F.col("dst").alias("name")))
        .unionByName(spark.createDataFrame([(root,)], ["name"]))
        .distinct()
    )
    return BfsResult(root=root, node_type=node_col, edges=result_edges, vertices=vertices)


def costar_bfs(
    cast_edges: DataFrame,
    name: str,
    node_type: str = ACTOR,
    level: int = 2,
    checkpoint: bool = True,
) -> BfsResult:
    """k-level co-star / shared-cast-movie graph — the reference's flagship
    query (``master.erl:251-288``). ``cast_edges`` is the silver
    ``(tconst, title, actor)`` table; both query directions run against it —
    no inverted copy needed.
    """
    if not name:
        # API-level input validation (F8, /root/reference/src/client/client.erl:139-140)
        raise ValueError("search name must be non-empty")
    if node_type not in (MOVIE, ACTOR):
        raise ValueError(f"node_type must be '{MOVIE}' or '{ACTOR}'")
    if not 1 <= level <= 10:
        raise ValueError("level must be in 1..10 (reference GUI offers 1..4)")

    node_col, via_col = ("actor", "title") if node_type == ACTOR else ("title", "actor")
    res = bipartite_bfs(cast_edges, node_col, via_col, name, level, checkpoint)
    return BfsResult(root=name, node_type=node_type, edges=res.edges, vertices=res.vertices)
