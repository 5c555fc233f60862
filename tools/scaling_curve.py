"""Scaling-curve harness: run selected headline queries at sf0.001 /
sf0.01 / sf0.1 (1× / 10× / 100× data) and report per-query wall time and
the 10×-data time ratios — the evidence behind SCALE.md's "would this
hold at 1000×" claims. A ratio near 10 on a 10× data step is linear
scaling; pair-join operators are expected to run hotter than linear in
dup density and are called out as such where they do.

Usage:  python tools/scaling_curve.py [query ...]   (default: curated set)
        python tools/scaling_curve.py --dirs DIR1,DIR2[,...] [query ...]

With ``--dirs`` the points are the given corpus directories instead of
the default sf0.001/sf0.01/sf0.1 triple — this is how the synthetic
decades (``spark-warehouse/scale10x``, ``scale100x`` from
tools/scale10x.py) are measured against /root/testdata/sf0.1 with the
same min-of-2 methodology the SCALING.md tables use.
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
    argv = list(sys.argv[1:])
    sfs = SFS
    labels = ["0.001", "0.01", "0.1"]
    if argv and argv[0] == "--dirs":
        if len(argv) < 2:
            sys.exit("--dirs needs a comma-separated directory list")
        sfs = tuple(argv[1].split(","))
        missing = [d for d in sfs if not os.path.isdir(d)]
        if missing:
            sys.exit(f"not a directory: {missing}")
        labels = [os.path.basename(d.rstrip("/")) for d in sfs]
        argv = argv[2:]
    names = tuple(argv) or DEFAULT
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
        for sf_dir in sfs:
            best = None
            n = 0
            for _ in range(2):  # min-of-2 per point
                t = time.time()
                n = len(fn(spark, sf_dir).collect())
                el = time.time() - t
                best = el if best is None else min(best, el)
            times.append(round(best, 3))
            rows.append(n)
        ratios = [
            round(times[i + 1] / times[i], 2) if times[i] > 0 else float("nan")
            for i in range(len(times) - 1)
        ]
        out[name] = {"sec": times, "rows": rows, "ratios": ratios}
        print(
            f"{name:32s} "
            + " ".join(f"{t:7.2f}" for t in times)
            + "   "
            + " ".join(f"x{r:<6}" for r in ratios)
            + f"  rows {rows[-1]}",
            file=sys.stderr,
        )
    print(json.dumps({"sfs": labels, "queries": out}))


if __name__ == "__main__":
    main()
