"""BFS + DOT export semantics (SURVEY.md §3.1, §2.9): two-hop levels,
global visited set, tree output, deterministic min-parent, k−1 rounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imdb_mapreduce_spark.operators.graph import bipartite_bfs, costar_bfs
from imdb_mapreduce_spark.operators.graph_export import sanitize_id, to_dot


def _edges(res):
    return {(r["src"], r["dst"], r["level"]) for r in res.edges.collect()}


def _verts(res):
    return {r["name"] for r in res.vertices.collect()}


def test_level1_is_root_only(cast_edges):
    # level k = k−1 expansion rounds → level 1 = no expansion (master.erl:259,271)
    res = costar_bfs(cast_edges, "Jane Doe", "actor", level=1)
    assert _edges(res) == set()
    assert _verts(res) == {"Jane Doe"}


def test_level2_costars(cast_edges):
    # Jane Doe's co-stars: John Q. Smith 0 (via Alpha), Bob O'Hara (via Beta)
    res = costar_bfs(cast_edges, "Jane Doe", "actor", level=2)
    assert _edges(res) == {
        ("Jane Doe", "John Q. Smith 0", 1),
        ("Jane Doe", "Bob O'Hara", 1),
    }


def test_level3_visited_set_global(cast_edges):
    # Round 2 expands John Q. Smith 0 and Bob O'Hara; all their co-stars
    # (Jane Doe, each other?) — John's co-stars = Jane (visited); Bob's =
    # Jane (visited). No new vertices → tree stops. The intermediate-hop
    # movies never appear as vertices.
    res = costar_bfs(cast_edges, "Jane Doe", "actor", level=3)
    assert _edges(res) == {
        ("Jane Doe", "John Q. Smith 0", 1),
        ("Jane Doe", "Bob O'Hara", 1),
    }
    assert _verts(res) == {"Jane Doe", "John Q. Smith 0", "Bob O'Hara"}


def test_movie_query_direction(cast_edges):
    # Movies sharing cast with Alpha Zero 0: Beta! (Jane), Epsilon (John)
    res = costar_bfs(cast_edges, "Alpha Zero 0", "movie", level=2)
    assert _edges(res) == {
        ("Alpha Zero 0", "Beta!", 1),
        ("Alpha Zero 0", "Epsilon", 1),
    }


def test_min_parent_deterministic(spark):
    # Diamond: root R and X both reach C in round 2; C discovered once,
    # attached to min(parent). Bipartite edges: (node, via).
    edges = spark.createDataFrame(
        [("R", 1), ("A", 1), ("B", 1), ("A", 2), ("C", 2), ("B", 3), ("C", 3)],
        ["node", "via"],
    )
    res = bipartite_bfs(edges, "node", "via", "R", level=3)
    got = {(r["src"], r["dst"]): r["level"] for r in res.edges.collect()}
    # Round 1: A,B from R. Round 2: C via A (min) not via B.
    assert got == {("R", "A"): 1, ("R", "B"): 1, ("A", "C"): 2}


def test_input_validation(cast_edges):
    with pytest.raises(ValueError):
        costar_bfs(cast_edges, "", "actor", 2)
    with pytest.raises(ValueError):
        costar_bfs(cast_edges, "x", "robot", 2)
    with pytest.raises(ValueError):
        costar_bfs(cast_edges, "x", "actor", 0)


def test_dot_export(cast_edges):
    res = costar_bfs(cast_edges, "Jane Doe", "actor", level=2)
    dot = to_dot(res)
    assert dot.startswith("digraph G {")
    assert 'Jane_Doe [label="Jane Doe"];' in dot
    # Sanitizer keeps digit 0 (reference bug graph.erl:30 fixed):
    assert sanitize_id("John Q. Smith 0") == "John_Q__Smith_0"
    assert "John_Q__Smith_0" in dot
    # surname order (last space-token, X6): "John Q. Smith 0" keys on "0",
    # which sorts before "O'Hara" — so John's edge precedes Bob's.
    assert dot.index("Jane_Doe -> John_Q__Smith_0") < dot.index(
        "Jane_Doe -> Bob_O_Hara"
    )


def test_result_independent_of_partitioning(spark):
    # Property (SURVEY §5.3): same result at different partition counts.
    data = [(f"n{i%7}", i % 11) for i in range(200)]
    for parts in (1, 5):
        edges = spark.createDataFrame(data, ["node", "via"]).repartition(parts)
        res = bipartite_bfs(edges, "node", "via", "n0", level=3)
        key = sorted((r["src"], r["dst"], r["level"]) for r in res.edges.collect())
        if parts == 1:
            first = key
        else:
            assert key == first


def test_deep_bfs_without_broadcast_hints(spark):
    # level >= 5 on a denser synthetic graph, forcing the guarded path:
    # max_broadcast_rows=0 disables every broadcast hint, so the frontier,
    # hop1, and visited joins all go through AQE shuffle planning. The
    # result must be identical to the hinted fast path.
    rows = []
    # 3 "generations" chained by shared movies + some dense co-casts
    for g in range(12):
        for a in range(6):
            rows.append((f"m{g}", f"a{g}_{a}"))   # clique within generation
            rows.append((f"m{g}b", f"a{g}_{a}"))
        rows.append((f"link{g}", f"a{g}_0"))
        rows.append((f"link{g}", f"a{g+1}_0"))    # bridge to next generation
    edges = spark.createDataFrame(rows, ["title", "actor"])

    fast = bipartite_bfs(edges, "actor", "title", "a0_0", level=6)
    slow = bipartite_bfs(
        edges, "actor", "title", "a0_0", level=6, max_broadcast_rows=0
    )
    fast_edges = {(r["src"], r["dst"], r["level"]) for r in fast.edges.collect()}
    slow_edges = {(r["src"], r["dst"], r["level"]) for r in slow.edges.collect()}
    assert fast_edges == slow_edges
    assert len(fast_edges) > 0
    # 5 expansion rounds -> levels 1..5 all reached (bridges chain outward)
    assert {r["level"] for r in fast.edges.collect()} == {1, 2, 3, 4, 5}


def test_png_render_gated(cast_edges, tmp_path):
    import shutil

    from imdb_mapreduce_spark.operators.graph_export import render_png

    res = costar_bfs(cast_edges, "Alice Alpha", level=2)
    out = str(tmp_path / "g.png")
    if shutil.which("dot") is None:
        with pytest.raises(RuntimeError, match="not found"):
            render_png(res, out)
    else:
        render_png(res, out)
        data = open(out, "rb").read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) > 100


def test_broadcast_escape_hatch_switches_plan(spark):
    """VERDICT r04 item 6: the fallback must be OBSERVABLE in the plan, not
    just asserted by code reading. With hints on, both hop joins broadcast;
    with hints off, no broadcast join remains in the two-hop plan."""
    import io
    from contextlib import redirect_stdout

    from imdb_mapreduce_spark.operators.graph import _two_hop

    edges = spark.createDataFrame(
        [(f"n{i % 20}", i % 13) for i in range(500)], ["node", "via"]
    )
    frontier = spark.createDataFrame([("n0",), ("n1",)], ["node"])

    def plan_of(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    hinted = plan_of(_two_hop(frontier, edges, "node", "via", True, True))
    assert "BroadcastHashJoin" in hinted

    unhinted = plan_of(
        _two_hop(
            frontier, edges, "node", "via",
            broadcast_frontier=False, broadcast_hop1=False,
        )
    )
    assert "BroadcastHashJoin" not in unhinted
    # AQE replans at runtime, but the static plan must already be a
    # shuffle-based join: sort-merge or shuffled-hash.
    assert "SortMergeJoin" in unhinted or "ShuffledHashJoin" in unhinted


def test_frontier_outgrows_broadcast_mid_traversal(spark):
    """Drive a traversal whose frontier starts under max_broadcast_rows and
    grows past it: round 1 broadcasts (frontier=1 ≤ 3), later rounds must
    take the guarded path (frontier ≫ 3) — and the answer cannot change."""
    rows = []
    for g in range(6):
        width = 2 ** (g + 1)  # frontier doubles every generation
        for a in range(width):
            rows.append((f"m{g}", f"a{g}_{a}"))
        for a in range(min(width, 4)):
            rows.append((f"bridge{g}", f"a{g}_{a}"))
            rows.append((f"bridge{g}", f"a{g+1}_{a}"))
    edges = spark.createDataFrame(rows, ["title", "actor"])

    unguarded = bipartite_bfs(edges, "actor", "title", "a0_0", level=5)
    guarded = bipartite_bfs(
        edges, "actor", "title", "a0_0", level=5, max_broadcast_rows=3
    )
    assert _edges(guarded) == _edges(unguarded)
    assert _verts(guarded) == _verts(unguarded)
    # sanity: the traversal really does outgrow the threshold
    per_level = {}
    for _, dst, lvl in _edges(unguarded):
        per_level[lvl] = per_level.get(lvl, 0) + 1
    assert max(per_level.values()) > 3


def test_bfs_budget_pre_join_estimate_fails_fast(spark):
    """A hub expansion whose ESTIMATED candidate volume exceeds the budget
    x slack must refuse BEFORE executing the round join (r06 review: the
    post-round-only check did all the unbounded work first)."""
    import pytest as _pytest

    from imdb_mapreduce_spark.operators.graph import (
        BfsBudgetExceeded,
        unipartite_bfs,
    )

    # complete-ish graph: 200 nodes, every node connected to node 0..19
    edges = spark.range(200).selectExpr("id AS src").crossJoin(
        spark.range(20).selectExpr("id AS dst")
    ).filter("src <> dst")
    with _pytest.raises(BfsBudgetExceeded) as ei:
        unipartite_bfs(edges, "src", "dst", 0, level=3, max_vertices=2)
    # either guard may fire first depending on degree stats, but the
    # estimated pre-join path must be reachable on this dense graph
    assert ei.value.budget == 2
