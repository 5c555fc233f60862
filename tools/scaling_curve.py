"""Scaling-curve harness: run selected headline queries at sf0.001 /
sf0.01 / sf0.1 (1× / 10× / 100× data) and report per-query wall time and
the 10×-data time ratios — the evidence behind SCALE.md's "would this
hold at 1000×" claims. A ratio near 10 on a 10× data step is linear
scaling; pair-join operators are expected to run hotter than linear in
dup density and are called out as such where they do.

Usage:  python tools/scaling_curve.py [query ...]   (default: curated set)
Writes one JSON line to stdout; pretty table to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

# One representative per plan family whose scaling behaviour matters:
# scan/agg, star join, window, BFS, SSSP, pair joins (jaccard + span),
# LSH (minhash + embedding), sketch, packing, end-to-end manifest.
DEFAULT = (
    "pricing_summary",
    "supplier_part_facts",
    "user_running_stats",
    "copurchase_bfs_l3",
    "copurchase_sssp",
    "ngram_jaccard_thresholded",
    "duplicate_span_pairs",
    "minhash_lsh_dups",
    "embedding_lsh_dups",
    "hll_distinct_users",
    "token_pack_assignment",
    "corpus_build_manifest",
)


# Timing here is deliberately LIGHTER than bench.py's harness (min-of-2,
# one shared-session warm-up) — bench.py stays the authoritative per-query
# methodology; this tool only needs stable RATIOS between scale factors.
# If bench.py's methodology changes, revisit whether the ratio harness
# should follow.
def main() -> None:
    names = tuple(sys.argv[1:]) or DEFAULT
    import __spark_entry__ as entrymod

    # validate names BEFORE paying Spark session startup
    registered = entrymod.queries()
    unknown = [n for n in names if n not in registered]
    if unknown:
        sys.exit(f"unknown queries: {unknown} — see tools/list_queries.py")
    from imdb_mapreduce_spark.session import get_spark

    spark = get_spark("scaling-curve")
    spark.range(1).count()
    qs = registered
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        times: list[float] = []
        rows: list[int] = []
        for sf_dir in SFS:
            best = None
            n = 0
            for _ in range(2):  # min-of-2 per point
                t = time.time()
                n = len(fn(spark, sf_dir).collect())
                el = time.time() - t
                best = el if best is None else min(best, el)
            times.append(round(best, 3))
            rows.append(n)
        r1 = round(times[1] / times[0], 2) if times[0] > 0 else float("nan")
        r2 = round(times[2] / times[1], 2) if times[1] > 0 else float("nan")
        out[name] = {
            "sec": times,
            "rows": rows,
            "ratio_10x_a": r1,
            "ratio_10x_b": r2,
        }
        print(
            f"{name:32s} {times[0]:7.2f} {times[1]:7.2f} {times[2]:7.2f}"
            f"   x{r1:<6} x{r2:<6}  rows {rows[2]}",
            file=sys.stderr,
        )
    print(json.dumps({"sfs": [0.001, 0.01, 0.1], "queries": out}))


if __name__ == "__main__":
    main()
