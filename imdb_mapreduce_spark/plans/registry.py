"""Query registry: the single source of truth behind ``__spark_entry__``.

Every operator from SURVEY.md §2 (and every [NORTH-STAR] pipeline operator)
registers here as a named ``Query``: a PySpark builder ``(spark, sf_dir) →
DataFrame`` plus, when SQL-expressible, the equivalent ANSI SQL the DuckDB
oracle runs on the same parquet tables. The driver hash-compares the two at
sf=0.01 (row count + schema + order-insensitive value hash).

Cross-engine determinism rules used throughout (see also
``plans/parity.py``):
- every computed column is aliased IDENTICALLY in Spark and SQL;
- floating-point aggregation goes through exact DECIMAL arithmetic and is
  cast back to DOUBLE at the end — summation order then cannot change the
  result between engines;
- arrays are emitted as sorted, comma-joined strings (list hashing across
  engines is representation-sensitive);
- window / top-k orderings always carry a unique tiebreak column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark_fn: SparkFn
    oracle: str | None  # ANSI SQL for DuckDB; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[SparkFn], SparkFn]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, tags, doc or (fn.__doc__ or ""))
        return fn

    return deco


# The external correctness driver sweeps the registry in iteration order and
# records at most ~50 rows per round (round 1 recorded exactly the first 50 of
# 58 registered queries). To guarantee every query earns a driver row across
# rounds, `all_queries` returns an explicitly ordered dict:
#   - `_HEAD`: queries with no driver row yet (or stalest row) go first;
#   - `_TAIL`: the least-information-loss queries go last — the rows-only
#     (oracle=None) entries whose driver row carries no hash check anyway,
#     plus variants whose sibling query stays inside the window and which
#     already hold a green hash-matched row from a previous round.
# Rotate these lists each round so coverage accumulates. See COVERAGE.md
# ("Driver correctness window") for the per-round rotation record.
_HEAD: tuple[str, ...] = (
    # r05 rotation: queries whose hash-verification work lands THIS round go
    # first (oracle conversions that have never had an oracle-backed driver
    # row), then the 37 queries whose newest green row is r03 (they sat in
    # _TAIL through r04 by design of the 50-row window), then the permanent
    # rows-only entries so each round refreshes their rows-only record.
    "pagerank_coparts",  # r05: exact-DECIMAL oracle conversion (VERDICT item 4)
    "simhash_near_dups",  # r05: portable md5 oracle conversion (VERDICT item 5)
    # NEW r05 session 3 (no driver row yet):
    "hll_distinct_users",  # portable-register HyperLogLog
    "duplicate_span_pairs",  # exact-substring span dedup (diagonal runs)
    "bpe_merge_candidates",  # BPE vocab-induction counting round
    "weighted_sample_tokens",  # token-proportional deterministic Bernoulli
    "copurchase_sssp",  # bounded weighted SSSP (min-plus iterative)
    "user_state_asof",  # SCD2 read side: state as of a point in time
    "paragraph_scrub_rebuild",  # C4-style scrub emitting rebuilt text
    "minhash_eval_metrics",  # LSH candidate precision/recall vs exact truth
    "ngram_jaccard_thresholded",  # NEW r05: length-prefiltered pairs — no row yet
    # NEW r05 operators (no driver row yet):
    "copurchase_triangles",  # triangle counting w/ a-priori min-support prune
    "paragraph_dedup_stats",  # sub-document boilerplate dedup profile
    "table_profile_orders",  # one-scan column profiler
    "quality_decile_filter",  # per-source NTILE quality gate
    "user_retention_cohorts",  # weekly cohort retention matrix
    "training_shuffle_order",  # seeded scalable global shuffle rank
    "zorder_layout_plan",  # Morton clustering key + file assignment
    "streaming_segment_purchase_totals",  # stream-static dim enrichment
    "kmv_distinct_users",  # portable mergeable cardinality sketch
    "props_redaction_stats",  # regex PII-masking audit
    "event_funnel_conversion",  # strictly-sequenced conversion funnel
    "event_transition_bigrams",  # behavioral Markov-chain rollup
    "incremental_priority_rollup",  # IVM: base ⊕ delta vs full recompute
    "corpus_build_manifest",  # END-TO-END: keep → shuffle → pack, one plan
    "event_value_anomalies",  # MAD-based robust outlier flags
    "embedding_label_centroids",  # exact-DECIMAL distributed centroid build
    "shipping_lag_stats",  # fact-fact join + integer-lag percentiles
    "packed_training_rows",  # byte-exact packed text artifacts
    # never-green entries must stay inside the 50-row window (guarded by
    # test_out_of_window_queries_union_green), so they precede the
    # union-green r03 refreshes below:
    "ann_lsh_topk",  # r05: oracle conversion (bucket fold + brute scoring,
    # both bit-identical primitives proven in r03/r04) — no hash row yet
    # r06 (VERDICT r05 item 3): ann_ivf_topk — the one permanent rows-only
    # entry through r05 — is DEREGISTERED: the registered IVF query is its
    # deterministic-pivot sibling below (same probe/search path, md5-
    # anchored cells, full DuckDB oracle); the KMeans-trained quantizer
    # stays as a library function whose correctness is pytest-pinned
    # (exact-within-probed-cells + full-probe ≡ brute force). The registry
    # is now 100% oracle-backed.
    "ann_ivf_det_topk",
    # NEW r05 (session 2): portable sketch/pruning/history operators — no rows yet
    "cm_sketch_heavy_hitters",  # count-min with one-sided-error audit
    "bloom_filter_prune",  # bit-packed bloom semi-join prune + confusion audit
    "user_state_scd2",  # SCD Type-2 validity-interval history build
    "kmv_set_ops",  # theta-style intersection/union estimates on KMV sketches
    "embedding_random_projection",  # JL 64d->16d sketch, norm audit
    "text_feature_hashing",  # vocabulary-free signed hashed bag-of-words
    "zone_map_prune_audit",  # file-skipping payoff of the zorder layout
    "ngram_containment_pairs",  # asymmetric quote/near-superset detection
    "split_leakage_audit",  # cross-split near-dup eval-integrity audit
    "lang_id_confusion",  # confusion-matrix eval of the lang-ID heuristic
    "media_phash_dedup",  # perceptual-hash near-dup pairs over binary payloads
    "streaming_cm_sketch_cells",  # the CM sketch as live streaming state
    "streaming_kmv_distinct",  # KMV as custom applyInPandasWithState state
    "snapshot_diff",  # change-data-feed diff of two table versions
    "ab_experiment_metrics",  # md5-arm experiment readout, exact money
    # r03-green, stalest first (all pushed out of the r04 window)
    "ngram_jaccard_pairs",  # r05: length-ratio prefilter added (VERDICT item 3)
    "ngram_jaccard_capped",  # r05: same prefilter — re-verify with sibling
    "dedup_exact_survivors",
    "rollup_grouping_flags",
    "events_json_struct",
    "embedding_label_dups",
    "customer_order_window",
    "orders_by_month",
    "supplier_unpivot",
    "early_not_recent_buyers",
    "brand_top2_parts",
    "minhash_lsh_dups",
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
    "copart_pairs_topk",
    "supplier_part_facts",
    "events_hourly",
    "order_price_quantiles",
    "region_rollup",
    "token_pack_assignment",
    "media_byte_histogram",
    "token_count_bpe",
    "tfidf_top_terms",
    "part_expr_catalog",
    "events_cube",
)
_TAIL: tuple[str, ...] = (
    # The 46 queries hash-green in CORRECTNESS_r04.json. The first ~9 still
    # land inside the driver's 50-row window (window − |_HEAD| slots), so the
    # most-valuable refreshes go first: queries whose code changes this round
    # or whose r04 bench moved.
    "event_value_histogram",  # r05: HIST_LO_CENTS offset fix (ADVICE item 1)
    "copurchase_bfs_l3",  # r05: distinct-edges measurement (VERDICT item 2)
    "user_sessions",  # r04 bench regression — re-confirm post NTZ layer
    "events_json_stats",  # r04 bench regression — re-confirm post NTZ layer
    "user_value_trend",
    "benchmark_decontam",  # r05: broadcast size gate (ADVICE item 4)
    "embedding_lsh_dups",
    "streaming_dedup_10min_counts",
    "dedup_exact_groups",
    # beyond the window — all r04-green, each family keeps an in-window sibling
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
    "user_running_stats",
    "local_supplier_revenue",
    "quantity_band_stats",
    "ann_cosine_topk",
)


def all_queries() -> dict[str, Query]:
    """Import all query modules (side-effect registration) and return them.

    The returned dict is ordered ``_HEAD`` → remaining (registration order) →
    ``_TAIL`` so the driver's bounded correctness sweep hits the queries that
    most need a fresh row first.
    """
    # Imports deferred so a syntax error in one module surfaces clearly and
    # the registry works from a bare `import registry`.
    from imdb_mapreduce_spark.plans import (  # noqa: F401
        relational,
        events,
        graph_queries,
        analytics,
        temporal_queries,
        quality,
    )
    from imdb_mapreduce_spark.pipeline import (  # noqa: F401
        curation,
        dedup,
        similarity,
        text,
        multimodal,
    )
    from imdb_mapreduce_spark.streaming import jobs  # noqa: F401

    stale = [n for n in (*_HEAD, *_TAIL) if n not in _REGISTRY]
    if stale:
        raise KeyError(
            f"stale _HEAD/_TAIL entries (renamed or removed queries): {stale}; "
            "update plans/registry.py rotation lists"
        )
    ordered: dict[str, Query] = {}
    for name in _HEAD:
        ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in _HEAD and name not in _TAIL:
            ordered[name] = q
    for name in _TAIL:
        ordered[name] = _REGISTRY[name]
    return ordered
