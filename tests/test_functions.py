"""Column-function library + hypothesis property tests (SURVEY.md §5.3)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from imdb_mapreduce_spark.functions.columns import (
    bucket_of,
    last_token,
    salted_collect_set,
    sanitized_identifier,
    strip_id_prefix,
)


def test_scalar_surface(spark):
    df = spark.createDataFrame(
        [("tt0000042", "John Q. Smith 0", "a b-c!0")], ["id", "name", "junk"]
    )
    row = df.select(
        strip_id_prefix("id").alias("i"),
        last_token("name").alias("t"),
        sanitized_identifier("junk").alias("s"),
        bucket_of("id", 8).alias("b"),
    ).collect()[0]
    assert row["i"] == 42
    assert row["t"] == "0"
    assert row["s"] == "a_b_c_0"  # digit 0 preserved (reference bug fixed)
    assert 0 <= row["b"] < 8


def test_salted_collect_equals_direct(spark):
    # One hot key with many values + several normal keys: salted two-phase
    # collect must equal the direct aggregate exactly.
    rows = [("hot", f"v{i}") for i in range(500)] + [
        (f"k{i % 7}", f"w{i}") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    direct = {
        r["k"]: sorted(r["vals"])
        for r in df.groupBy("k").agg(F.collect_set("v").alias("vals")).collect()
    }
    salted = {
        r["k"]: list(r["vals"])
        for r in salted_collect_set(df, "k", "v", "vals").collect()
    }
    assert salted == direct


# -- hypothesis property tests ---------------------------------------------

@st.composite
def id_strings(draw):
    prefix = draw(st.sampled_from(["tt", "nm"]))
    num = draw(st.integers(min_value=0, max_value=99_999_999))
    return prefix + str(num).zfill(7), num


@given(st.lists(id_strings(), min_size=1, max_size=20, unique_by=lambda t: t[0]))
@settings(max_examples=10, deadline=None)
def test_id_parse_roundtrip(spark, ids):
    """X2 parser inverts the tt/nm zero-padded formatting for any id."""
    df = spark.createDataFrame([(s,) for s, _ in ids], ["id"])
    got = [r[0] for r in df.select(strip_id_prefix("id")).collect()]
    assert got == [n for _, n in ids]


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 5)),
        min_size=1,
        max_size=60,
    ),
    st.integers(2, 4),
)
@settings(max_examples=8, deadline=None)
def test_bfs_invariants(spark, raw_edges, level):
    """BFS invariants for arbitrary bipartite graphs: result is a tree
    (each vertex one incoming edge), root never a dst, no dst repeats,
    levels within bounds (SURVEY §5.3)."""
    from imdb_mapreduce_spark.operators.graph import bipartite_bfs

    edges = spark.createDataFrame(
        [(f"n{a}", b) for a, b in raw_edges], ["node", "via"]
    )
    root = f"n{raw_edges[0][0]}"
    res = bipartite_bfs(edges, "node", "via", root, level=level, checkpoint=False)
    rows = res.edges.collect()
    dsts = [r["dst"] for r in rows]
    assert len(dsts) == len(set(dsts))  # visited-set: unique vertices
    assert root not in dsts  # root never re-discovered
    assert all(1 <= r["level"] <= level - 1 for r in rows)
    # tree: every non-root vertex has exactly one edge; vertex count checks
    assert {r["name"] for r in res.vertices.collect()} == set(dsts) | {root}
