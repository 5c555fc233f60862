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
R14_HEAD = (
    "events_multires_distinct_rollup",
    "events_multires_rollup_incremental",
    "events_multires_rollup_realtime",
    "streaming_sessions_tws",
    "session_overlap_topk",
    "events_multires_distinct_incremental",
    "events_multires_distinct_realtime",
    "events_rollup_user_erasure",
    "events_distinct_user_erasure",
    "user_running_stats",
    "local_supplier_revenue",
    "quantity_band_stats",
    "copurchase_bfs_l3",
    "events_variant_stats",
    "copurchase_sssp",
    "copurchase_triangles",
    "copart_pairs_topk",
    "basket_association_rules",
    "ann_cosine_topk",
    "simhash_near_dups",
    "hll_distinct_users",
    "duplicate_span_pairs",
    "bpe_merge_candidates",
    "weighted_sample_tokens",
    "user_state_asof",
    "paragraph_scrub_rebuild",
    "minhash_eval_metrics",
    "ngram_jaccard_thresholded",
    "paragraph_dedup_stats",
    "table_profile_orders",
    "quality_decile_filter",
    "user_retention_cohorts",
    "training_shuffle_order",
    "streaming_segment_purchase_totals",
    "kmv_distinct_users",
    "props_redaction_stats",
    "event_funnel_conversion",
    "event_transition_bigrams",
    "incremental_priority_rollup",
    "corpus_build_manifest",
    "event_value_anomalies",
    "embedding_label_centroids",
    "shipping_lag_stats",
    "packed_training_rows",
    "ann_lsh_topk",
    "ann_ivf_det_topk",
    "cm_sketch_heavy_hitters",
    "bloom_filter_prune",
    "user_state_scd2",
    "kmv_set_ops",
)


def test_planner_matches_the_landed_r14_rotation():
    """Ground truth: replaying the planner against the real landed
    CORRECTNESS_r01..r13 union with r14's code-changed set must
    reproduce the r14 window EXACTLY as committed at the r14 rotation
    (the literal above) — proof the executable policy and the prose
    policy are one. Queries registered in FUTURE rounds are excluded
    from the replay (they did not exist when r14 was planned)."""
    import glob

    from imdb_mapreduce_spark.plans.registry import all_queries

    paths = [
        p
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if int(os.path.basename(p)[13:15]) <= 13
    ]
    if not paths:
        pytest.skip("no CORRECTNESS files (round 1)")
    newest = plan_rotation.newest_green_rounds(paths)
    qs = all_queries()
    known_at_r14 = set(R14_HEAD) | set(newest)
    order = [n for n in qs if n in known_at_r14]
    if set(R14_HEAD) - set(order):
        pytest.skip("r14 queries renamed/removed — replay no longer applies")
    head, _tail, _notes = plan(
        order,
        {n for n in order if qs[n].oracle is not None},
        newest,
        code_changed=[
            "events_multires_distinct_rollup",
            "events_multires_rollup_incremental",
            "events_multires_rollup_realtime",
            "streaming_sessions_tws",
            "session_overlap_topk",
        ],
    )
    assert list(head) == list(R14_HEAD)
