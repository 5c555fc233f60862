"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan build + execution + driver fetch of the
result), after one untimed warm-up query to exclude JVM/session start from
per-query numbers (session startup is reported separately as "startup_sec").
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline set: one per operator family — scan/agg, join/topk, star join,
# window analytics, sessionization, time buckets, graph BFS, co-occurrence,
# dedup (exact + near), ANN, text, multimodal. Deliberately excludes the
# all-pairs-heavy embedding_label_dups at bench scale (bench is about the
# scalable paths).
HEADLINE = (
    "pricing_summary",
    "revenue_topk",
    "supplier_part_facts",
    "region_rollup",
    "orders_per_customer",
    "user_running_stats",
    "user_sessions",
    "events_10min_windows",
    "events_json_stats",
    "copurchase_bfs_l3",
    "copart_pairs_topk",
    "dedup_exact_groups",
    "ngram_jaccard_pairs",
    "corpus_keep_list",
    "minhash_lsh_dups",
    "embedding_lsh_dups",
    "ann_cosine_topk",
    "doc_quality_stats",
    "media_metadata_stats",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    t0 = time.time()
    from imdb_mapreduce_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    spark.range(1).count()  # force session up
    startup = time.time() - t0

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    row_counts: dict[str, int] = {}
    # Warm-up: small query to JIT the read path (untimed).
    qs["priority_segment_union"](spark, sf_dir).collect()

    # Min-of-2 per query for steady-state latency; heavy queries (>2s)
    # get a third pass — their GC/background-load variance is the main
    # source of round-over-round noise in the total.
    for name in HEADLINE:
        fn = qs[name]
        best = float("inf")
        passes = 2
        done = 0
        while done < passes:
            t = time.time()
            rows = fn(spark, sf_dir).collect()
            best = min(best, time.time() - t)
            row_counts[name] = len(rows)
            del rows
            done += 1
            if done == 2 and best > 2.0:
                passes = 3
        timings[name] = round(best, 3)

    # "value" is the steady-state total: sum of per-query min-of-2 wall
    # times, session startup excluded (reported separately) — directly
    # comparable round over round per query.
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "rows": row_counts,
                "sf": sf,
                "steady_total_sec": total,
                "startup_sec": round(startup, 2),
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
