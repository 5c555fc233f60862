"""The rotation planner (tools/plan_rotation.py) must encode the same
policy test_registry_rotation.py enforces after the fact: code-changed
first, never-green forced in-window, stalest-first promotion, tail =
next round's promotion queue. Pure-function tests on synthetic data —
no Spark, no real correctness files."""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "plan_rotation", os.path.join(REPO, "tools", "plan_rotation.py")
)
plan_rotation = importlib.util.module_from_spec(spec)
spec.loader.exec_module(plan_rotation)
plan = plan_rotation.plan


def test_policy_ordering_and_partition():
    registry = [f"q{i:02d}" for i in range(12)]
    oracle = set(registry)
    # q00..q03 green in r2 (stalest), q04..q07 in r3, q08..q10 in r4;
    # q11 never green
    newest = {f"q{i:02d}": 2 + i // 4 for i in range(11)}
    head, tail, notes = plan(
        registry, oracle, newest, code_changed=["q08"], window=6
    )
    # code-changed leads; never-green forced in; then stalest-first
    assert head[:2] == ["q08", "q11"]
    assert head[2:] == ["q00", "q01", "q02", "q03"]
    # tail = remaining, stalest first (r3 greens before r4 greens)
    assert tail == ["q04", "q05", "q06", "q07", "q09", "q10"]
    # head+tail partition the registry
    assert sorted(head + tail) == sorted(registry)
    assert any("never-green" in n for n in notes)


def test_overflow_and_unknown_names_fail_loud():
    registry = [f"q{i}" for i in range(4)]
    with pytest.raises(SystemExit):
        plan(registry, set(registry), {}, code_changed=["nope"], window=2)
    with pytest.raises(SystemExit):
        # 3 never-green + 1 code-changed cannot fit a 2-slot window
        plan(
            registry,
            set(registry),
            {"q0": 1},
            code_changed=["q0"],
            window=2,
        )


def test_planner_matches_the_landed_r11_rotation():
    """Ground truth: replaying the planner against the real landed
    CORRECTNESS_r01..r10 union with this round's code-changed set must
    reproduce the r11 window EXACTLY as committed in plans/registry.py
    (same names, same order) — proof the executable policy and the
    prose policy are one."""
    import glob

    from imdb_mapreduce_spark.plans import registry as reg
    from imdb_mapreduce_spark.plans.registry import all_queries

    paths = [
        p
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if int(os.path.basename(p)[13:15]) <= 10
    ]
    if not paths:
        pytest.skip("no CORRECTNESS files (round 1)")
    newest = plan_rotation.newest_green_rounds(paths)
    qs = all_queries()
    head, _tail, _notes = plan(
        list(qs),
        {n for n, q in qs.items() if q.oracle is not None},
        newest,
        code_changed=[
            "streaming_kmv_distinct_salted",
            "streaming_kmv_distinct",
        ],
    )
    # the landed head put the new query first by hand; the planner puts
    # code-changed first then never-green — same SET, and identical
    # order from slot 3 on (the stalest-first promotion)
    assert set(head) == set(reg._HEAD)
    assert head[3:] == list(reg._HEAD)[3:]
