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
    # the 15 queries whose latest driver row is from r01 (or rows-only):
    # rotated to the head for r03 so every registered query's driver row is
    # at most one round old (VERDICT r02 item 1)
    "ngram_jaccard_capped",
    "dedup_exact_survivors",
    "rollup_grouping_flags",
    "events_json_struct",
    "embedding_label_dups",
    "events_10min_windows",
    "customer_order_window",
    "orders_by_month",
    "supplier_unpivot",
    "early_not_recent_buyers",
    "brand_top2_parts",
    "minhash_lsh_dups",  # r03: converted to portable md5 minhash with oracle
    "simhash_near_dups",  # rows-only (oracle=None)
    "ann_ivf_topk",  # rows-only; r03: no-op distinct removed
    "ann_lsh_topk",  # rows-only; r03: arrow matmul bucket path
    # queries whose code changed in r03 → must re-earn a driver row
    "user_value_trend",  # r03: intercept unit fix (ADVICE r02 medium)
    # NEW in r03 → no driver row exists yet
    "user_running_stats_salted",  # skew-safe two-phase plan, unsalted oracle
    "inverted_index_postings",
    "tfidf_top_terms",
    "doc_chunk_windows",
    "token_pack_assignment",
    "embedding_int8_quant",
)
_TAIL: tuple[str, ...] = (
    # all green hash-matched in CORRECTNESS_r02.json with code unchanged in
    # r03; families keep an in-window sibling where one exists
    "media_metadata_stats",  # sibling: media_byte_histogram
    "media_feature_extract",
    "media_resize_plan",
    "media_frame_sample",
    "media_format_rollup",
    "doc_fingerprint_rolling",  # sibling: token_count_bpe (text family)
    "dataset_split_assignment",
    "content_sample",
    "doc_repetition_stats",
    "source_quality_profile",
    "streaming_10min_counts",
    "streaming_click_attribution",
    "corpus_keep_list",
    "embedding_lsh_dups",  # sibling: ann_cosine_topk (similarity family)
    "orders_per_customer",  # sibling: region_rollup (relational family)
    # demoted in r03 to keep head+middle at the 50-row window after the 4
    # new-query additions; all r02-green with code unchanged, each family
    # keeps an in-window sibling
    "events_json_stats",  # sibling: events_json_struct (_HEAD)
    "user_event_pivot",  # sibling: events_cube
    "fuzzy_name_match",  # sibling: nation_customer_sorted (string family)
    "embedding_norm_stats",  # sibling: doc_embedding_profile
    "doc_quality_stats",  # sibling: token_count_bpe (text family)
    "lang_id_heuristic",  # sibling: token_count_bpe
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
    )
    from imdb_mapreduce_spark.pipeline import (  # noqa: F401
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
