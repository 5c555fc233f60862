"""Connected-components operator: exact clusters on known graphs."""

from __future__ import annotations

from imdb_mapreduce_spark.operators.components import connected_components


def _cc(spark, pairs, **kw):
    # driver_threshold=0 forces the distributed loop — these tests verify
    # the iterative algorithms, not the small-graph union-find shortcut
    kw.setdefault("driver_threshold", 0)
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return {
        r["node"]: r["component"]
        for r in connected_components(df, "src", "dst", **kw).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_diameter(spark):
    # long chain exercises multi-round propagation
    got = _cc(spark, [(i, i + 1) for i in range(1, 12)])
    assert set(got.values()) == {1}
    assert len(got) == 12


def test_cycle_and_strings(spark):
    got = _cc(spark, [("b", "c"), ("c", "a"), ("a", "b"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def _cc_star(spark, pairs):
    return _cc(spark, pairs, algorithm="star")


def test_star_path_graph_beyond_label_budget(spark):
    # Path of 61 nodes: diameter 60 >> max_iter=20, where label propagation
    # cannot converge; alternating star needs only O(log^2 n) rounds.
    got = _cc_star(spark, [(i, i + 1) for i in range(60)])
    assert len(got) == 61
    assert set(got.values()) == {0}


def test_star_agrees_with_label_propagation(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (7, 7)]
    assert _cc_star(spark, pairs) == _cc(spark, pairs)


def test_label_nonconvergence_warns(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(i, i + 1) for i in range(30)], ["src", "dst"])
    with _pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(
            df, "src", "dst", max_iter=3, driver_threshold=0
        ).collect()


def test_driver_union_find_matches_distributed(spark):
    # the small-graph shortcut (default threshold) must produce exactly
    # the distributed loop's min-label components, for both algorithms
    pairs = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (7, 7), (5, 4)]
    df = spark.createDataFrame(pairs, ["src", "dst"])
    fast = {
        r["node"]: r["component"]
        for r in connected_components(df, "src", "dst").collect()
    }
    assert fast == _cc(spark, pairs)
    assert fast == _cc_star(spark, pairs)


def _nx_components(pairs):
    # pure-python reference: min-label components via repeated relaxation
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {n: n for n in adj}
    changed = True
    while changed:
        changed = False
        for n in adj:
            m = min([label[n]] + [label[v] for v in adj[n]])
            if m < label[n]:
                label[n] = m
                changed = True
    # propagate to fixpoint (label chains)
    for n in adj:
        while label[label[n]] != label[n]:
            label[n] = label[label[n]]
    return label


def test_property_all_algorithms_agree_on_random_graphs(spark):
    from hypothesis import given, settings, strategies as st

    @given(
        st.lists(
            st.tuples(st.integers(0, 15), st.integers(0, 15)),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=8, deadline=None)
    def check(pairs):
        want = _nx_components(pairs)
        df = spark.createDataFrame(pairs, ["src", "dst"])
        for kw in (
            {},  # driver union-find shortcut
            {"driver_threshold": 0},  # distributed label propagation
            {"driver_threshold": 0, "algorithm": "star"},  # distributed star
        ):
            got = {
                r["node"]: r["component"]
                for r in connected_components(df, "src", "dst", **kw).collect()
            }
            assert got == want, kw

    check()
