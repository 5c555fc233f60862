"""PageRank: distributed iteration vs a pure-Python reference."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from imdb_mapreduce_spark.operators.pagerank import pagerank

SF = "/root/testdata/sf0.001"


def _py_pagerank(edges, iterations=10, damping=0.85):
    out = defaultdict(list)
    nodes = set()
    for s, d in edges:
        out[s].append(d)
        nodes.update((s, d))
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = defaultdict(float)
        for s, targets in out.items():
            share = rank[s] / len(targets)
            for d in targets:
                contrib[d] += share
        rank = {v: base + damping * contrib.get(v, 0.0) for v in nodes}
    return rank


def test_pagerank_matches_python_reference(spark):
    edges = [
        (1, 2), (2, 1),
        (2, 3), (3, 2),
        (3, 1), (1, 3),
        (4, 1), (1, 4),
        (5, 9),  # directed edge; 9 is a sink for 5's mass
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=10).collect()}
    want = _py_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_pagerank_sums_to_one_on_symmetric_graph(spark):
    # With every node having out-edges (symmetrized graph), total rank is
    # conserved: sum == 1 within float tolerance.
    edges = [(a, b) for a in range(6) for b in range(6) if a != b and (a + b) % 3]
    df = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "src long, dst long"
    )
    got = pagerank(df, iterations=8).agg(F.sum("rank")).collect()[0][0]
    assert abs(got - 1.0) < 1e-9


def test_pagerank_coparts_query(spark):
    from imdb_mapreduce_spark.plans.graph_queries import pagerank_coparts

    rows = pagerank_coparts(spark, SF).collect()
    assert 0 < len(rows) <= 50
    # descending, deterministic tiebreak
    ranks = [(r["rank"], r["part"]) for r in rows]
    assert ranks == sorted(ranks, key=lambda t: (-t[0], t[1]))
    # hubs rank above the uniform prior; every rank positive
    assert ranks[0][0] > ranks[-1][0] > 0


def test_pagerank_coparts_matches_python_on_real_graph(spark):
    """Full end-to-end check on the sf0.001 co-purchase graph: same edge
    set into the Python reference, same 10 iterations, values within
    float-accumulation tolerance and the top-50 membership agrees."""
    import duckdb

    from imdb_mapreduce_spark.plans.graph_queries import pagerank_coparts

    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH e AS (SELECT DISTINCT l_orderkey, l_partkey
                   FROM read_parquet('{SF}/lineitem.parquet'))
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM e a JOIN e b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        """
    ).fetchall()
    want = _py_pagerank(edges)
    got = {r["part"]: r["rank"] for r in pagerank_coparts(spark, SF).collect()}
    for part, rank in got.items():
        assert abs(rank - want[part]) < 1e-9
    top50 = sorted(want, key=lambda v: (-want[v], v))[:50]
    assert set(got) == set(top50)


def test_pagerank_exact_tracks_float_pagerank(spark):
    """The scaled-integer fixed-point iteration must agree with the float
    iteration to ~1e-9 (floor-division leakage is ~deg ulps per round at
    scale 10^15) and preserve the rank ordering."""
    from imdb_mapreduce_spark.operators.pagerank import pagerank_exact

    edges = [(a, b) for a in range(8) for b in range(8) if a != b and (a + b) % 3]
    edges = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, "src long, dst long")
    flt = {r["node"]: r["rank"] for r in pagerank(df, iterations=10).collect()}
    exact = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_exact(df, iterations=10).collect()
    }
    assert set(flt) == set(exact)
    scale = 10**15
    for v, rs in exact.items():
        assert abs(rs / scale - flt[v]) < 1e-9, (v, rs, flt[v])
    # ordering agrees (distinct-enough ranks on this graph)
    by_float = sorted(flt, key=lambda v: (-flt[v], v))
    by_exact = sorted(exact, key=lambda v: (-exact[v], v))
    assert by_float == by_exact


def test_at_scale_branch_matches_default(spark):
    """The r09 at-scale branch (scan-backed edges, checkpoint every
    round, post-checkpoint GC) is a resource policy, never a semantic
    one: ranks must be bit-identical to the default branch."""
    from imdb_mapreduce_spark.operators.pagerank import pagerank_exact

    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3), (4, 1), (1, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")

    def ranks(**kw):
        return {
            r["node"]: r["rank_scaled"]
            for r in pagerank_exact(df, iterations=7, **kw).collect()
        }

    default = ranks()
    at_scale = ranks(persist_edges=False, checkpoint_every=1, shuffle_gc=True)
    assert default and at_scale == default


def test_shuffle_gc_survives_missing_jvm_handle(spark, monkeypatch):
    """`_jvm` is a private Py4J handle absent on Spark Connect sessions
    (VERDICT r09 item 3): with it gone, the at-scale branch must degrade
    to checkpoint-only with a RuntimeWarning — same ranks, no crash."""
    import warnings

    from imdb_mapreduce_spark.operators.pagerank import pagerank_exact

    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    want = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_exact(df, iterations=4).collect()
    }

    # Spark's own execution path still needs `_jvm` in local mode, so the
    # stub fails only the `System` handle the guard reaches for (on a real
    # Connect session the whole attribute is absent; the guard catches
    # both shapes with the same except).
    real_jvm = spark.sparkContext._jvm

    class _NoSystemJvm:
        def __getattr__(self, name):
            if name == "System":
                raise AttributeError(name)
            return getattr(real_jvm, name)

    monkeypatch.setattr(spark.sparkContext, "_jvm", _NoSystemJvm())
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = {
            r["node"]: r["rank_scaled"]
            for r in pagerank_exact(
                df,
                iterations=4,
                persist_edges=False,
                checkpoint_every=1,
                shuffle_gc=True,
            ).collect()
        }
    assert got == want
    assert any(
        "JVM GC unavailable" in str(w.message)
        for w in caught
        if issubclass(w.category, RuntimeWarning)
    )
