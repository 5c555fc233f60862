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


# The r13 window as committed in plans/registry.py at the r13 rotation —
# a LITERAL snapshot, deliberately not reg._HEAD. The replay target
# moves forward each rotation (r11 -> r12 -> r13 precedent): the
# planner's tie-break among equally-stale fills follows the LIVE
# registry iteration order, which each rotation rewrites — so only the
# latest landed rotation is exactly replayable, and that is the one the
# rotation contract cares about ("the landed window IS the planner
# output").
R13_HEAD = (
    "session_overlap_topk",
    "peak_concurrent_sessions",
    "events_multires_rollup",
    "events_multires_rollup_incremental",
    "streaming_sessions_tws",
    "events_multires_rollup_realtime",
    "events_multires_distinct_rollup",
    "event_value_histogram",
    "user_sessions",
    "events_json_stats",
    "minhash_lsh_dups",
    "semdedup_eval_metrics",
    "semdedup_clusters",
    "user_value_trend",
    "benchmark_decontam",
    "streaming_dedup_10min_counts",
    "dedup_exact_groups",
    "streaming_click_attribution",
    "streaming_10min_counts",
    "orders_per_customer",
    "corpus_keep_list",
    "media_metadata_stats",
    "media_feature_extract",
    "media_resize_plan",
    "media_frame_sample",
    "media_format_rollup",
    "doc_fingerprint_rolling",
    "dataset_split_assignment",
    "content_sample",
    "doc_repetition_stats",
    "source_quality_profile",
    "user_event_pivot",
    "fuzzy_name_match",
    "embedding_norm_stats",
    "doc_quality_stats",
    "lang_id_heuristic",
    "stratified_sample_hash",
    "sample_n_per_group",
    "cdc_orders_upsert",
    "dq_expectations",
    "events_sliding_windows",
    "events_gapfill_zero",
    "segment_reconciliation_fullouter",
    "loyal_buyer_intersect",
    "dedup_survivors_by_quality",
    "corpus_mix_allocation",
    "events_rolling_1h",
    "key_skew_profile",
    "priority_segment_union",
    "active_buildings_semi",
)


def test_planner_matches_the_landed_r13_rotation():
    """Ground truth: replaying the planner against the real landed
    CORRECTNESS_r01..r12 union with r13's code-changed set must
    reproduce the r13 window EXACTLY as committed at the r13 rotation
    (the literal above) — proof the executable policy and the prose
    policy are one. Queries registered in FUTURE rounds are excluded
    from the replay (they did not exist when r13 was planned)."""
    import glob

    from imdb_mapreduce_spark.plans.registry import all_queries

    paths = [
        p
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if int(os.path.basename(p)[13:15]) <= 12
    ]
    if not paths:
        pytest.skip("no CORRECTNESS files (round 1)")
    newest = plan_rotation.newest_green_rounds(paths)
    qs = all_queries()
    known_at_r13 = set(R13_HEAD) | set(newest)
    order = [n for n in qs if n in known_at_r13]
    if set(R13_HEAD) - set(order):
        pytest.skip("r13 queries renamed/removed — replay no longer applies")
    head, _tail, _notes = plan(
        order,
        {n for n in order if qs[n].oracle is not None},
        newest,
        code_changed=[
            "session_overlap_topk",
            "peak_concurrent_sessions",
            "events_multires_rollup",
            "events_multires_rollup_incremental",
            "streaming_sessions_tws",
            "events_multires_rollup_realtime",
            "events_multires_distinct_rollup",
        ],
    )
    assert list(head) == list(R13_HEAD)
