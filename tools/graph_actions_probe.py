"""Profile the iterative graph family's per-action overhead (r16, VERDICT
r15 item 2): for each of pagerank_coparts / copurchase_sssp /
copurchase_bfs_l3, run warm passes and count the SPARK JOBS the query
launches (statusTracker per job group) — the r15 sessions proved
per-action/driver overhead, not data volume, is the local cost center for
multi-action queries, so jobs-per-query is the number to drive down.

Usage: python tools/graph_actions_probe.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = sys.argv[1:] or [
    "pagerank_coparts",
    "copurchase_sssp",
    "copurchase_bfs_l3",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from imdb_mapreduce_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("graph_actions_probe")
    sc = spark.sparkContext
    qs = entrymod.queries()
    # warm the read path (untimed)
    qs["priority_segment_union"](spark, sf_dir).collect()

    out: dict[str, dict] = {}
    for name in QUERIES:
        fn = qs[name]
        passes: list[float] = []
        for _ in range(3):
            t = time.time()
            fn(spark, sf_dir).collect()
            passes.append(round(time.time() - t, 3))
        # counted pass: isolate in a job group
        group = f"probe_{name}"
        sc.setJobGroup(group, name)
        t = time.time()
        rows = fn(spark, sf_dir).collect()
        wall = round(time.time() - t, 3)
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        out[name] = {
            "warm_passes": passes,
            "counted_pass_sec": wall,
            "n_jobs": len(jobs),
            "sec_per_job": round(wall / max(1, len(jobs)), 3),
            "n_rows": len(rows),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
