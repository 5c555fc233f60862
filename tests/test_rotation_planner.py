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


# The r11 window as committed in plans/registry.py at r11 close — a
# LITERAL snapshot, deliberately not reg._HEAD: future rounds rotate
# the live tuple, but the r11 ground truth is immutable, so the replay
# below stays valid forever.
R11_HEAD = (
    "events_variant_stats",
    "streaming_kmv_distinct_salted",
    "streaming_kmv_distinct",
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
    "embedding_random_projection",
    "text_feature_hashing",
    "ngram_containment_pairs",
    "lang_id_confusion",
    "media_phash_dedup",
    "streaming_cm_sketch_cells",
    "snapshot_diff",
    "ab_experiment_metrics",
    "ngram_jaccard_pairs",
    "ngram_jaccard_capped",
    "dedup_exact_survivors",
)


def test_planner_matches_the_landed_r11_rotation():
    """Ground truth: replaying the planner against the real landed
    CORRECTNESS_r01..r10 union with r11's code-changed set must
    reproduce the r11 window EXACTLY as committed at r11 close (the
    literal above) — proof the executable policy and the prose policy
    are one. Queries registered in FUTURE rounds are excluded from the
    replay (they did not exist when r11 was planned)."""
    import glob

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
    known_at_r11 = set(R11_HEAD) | set(newest)
    order = [n for n in qs if n in known_at_r11]
    if set(R11_HEAD) - set(order):
        pytest.skip("r11 queries renamed/removed — replay no longer applies")
    head, _tail, _notes = plan(
        order,
        {n for n in order if qs[n].oracle is not None},
        newest,
        code_changed=[
            "streaming_kmv_distinct_salted",
            "streaming_kmv_distinct",
        ],
    )
    # the landed head put the new query first by hand; the planner puts
    # code-changed first then never-green — same SET, and identical
    # order from slot 3 on (the stalest-first promotion)
    assert set(head) == set(R11_HEAD)
    assert head[3:] == list(R11_HEAD)[3:]
