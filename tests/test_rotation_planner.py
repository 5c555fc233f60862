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


# The r12 window as committed in plans/registry.py at r12 close — a
# LITERAL snapshot, deliberately not reg._HEAD. The replay target moves
# forward each rotation (r11 -> r12 precedent): the planner's tie-break
# among equally-stale fills follows the LIVE registry iteration order,
# which each rotation rewrites — so only the latest landed rotation is
# exactly replayable, and that is the one the rotation contract cares
# about ("the landed window IS the planner output").
R12_HEAD = (
    "streaming_kmv_distinct_tws",
    "streaming_kmv_distinct",
    "streaming_kmv_distinct_salted",
    # mid-round never-green additions (the r11 events_variant_stats
    # precedent): the planner forces them in-window directly after the
    # code-changed entries; the last fills (minhash_lsh_dups,
    # semdedup_eval_metrics, semdedup_clusters) were displaced to the
    # r13 queue head as they landed.
    "session_overlap_topk",
    "peak_concurrent_sessions",
    "events_multires_rollup",
    "embedding_dim_profile",
    "hard_negative_lsh",
    "ann_recall_eval",
    "hard_negative_mining",
    "incremental_dedup_verdicts",
    "streaming_foreachbatch_upsert",
    "embedding_lsh_dups",
    "split_leakage_audit",
    "zorder_layout_plan",
    "zone_map_prune_audit",
    "rollup_grouping_flags",
    "events_json_struct",
    "embedding_label_dups",
    "customer_order_window",
    "orders_by_month",
    "supplier_unpivot",
    "early_not_recent_buyers",
    "brand_top2_parts",
    "user_running_stats_salted",
    "inverted_index_postings",
    "doc_chunk_windows",
    "embedding_int8_quant",
    "pricing_summary",
    "revenue_topk",
    "customers_without_orders",
    "order_basket_lookup",
    "nation_customer_sorted",
    "asof_last_purchase",
    "events_10min_windows",
    "dedup_clusters",
    "parts_above_brand_avg",
    "doc_embedding_profile",
    "supplier_part_facts",
    "events_hourly",
    "order_price_quantiles",
    "region_rollup",
    "token_pack_assignment",
    "media_byte_histogram",
    "token_count_bpe",
    "doc_rarity_scores",
    "tfidf_top_terms",
    "part_expr_catalog",
    "events_cube",
    "pagerank_coparts",
)


def test_planner_matches_the_landed_r12_rotation():
    """Ground truth: replaying the planner against the real landed
    CORRECTNESS_r01..r11 union with r12's code-changed set must
    reproduce the r12 window EXACTLY as committed at r12 close (the
    literal above) — proof the executable policy and the prose policy
    are one. Queries registered in FUTURE rounds are excluded from the
    replay (they did not exist when r12 was planned)."""
    import glob

    from imdb_mapreduce_spark.plans.registry import all_queries

    paths = [
        p
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if int(os.path.basename(p)[13:15]) <= 11
    ]
    if not paths:
        pytest.skip("no CORRECTNESS files (round 1)")
    newest = plan_rotation.newest_green_rounds(paths)
    qs = all_queries()
    known_at_r12 = set(R12_HEAD) | set(newest)
    order = [n for n in qs if n in known_at_r12]
    if set(R12_HEAD) - set(order):
        pytest.skip("r12 queries renamed/removed — replay no longer applies")
    head, _tail, _notes = plan(
        order,
        {n for n in order if qs[n].oracle is not None},
        newest,
        code_changed=[
            "streaming_kmv_distinct_tws",
            "streaming_kmv_distinct",
            "streaming_kmv_distinct_salted",
        ],
    )
    assert list(head) == list(R12_HEAD)
