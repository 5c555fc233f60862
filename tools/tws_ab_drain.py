"""The TWS-vs-Arrow-wall runtime A/B (SCALING.md r11 prediction, run in r12).

SCALING.md r11 pinned the per-group Arrow-bridge wall to
``applyInPandasWithState``'s one-GROUP-per-channel-call write granularity
and predicted — from the shipped 4.1.2 bytecode plus a measured batch
``applyInPandas`` control — that ``transformWithStateInPandas`` dodges it
by construction (bounded batches per channel call). The runtime half was
protobuf-blocked until r12's ``protobuf_compat`` host-runtime discovery.
This tool runs the actual drains, through the REGISTERED queries so the
measured plans are exactly the shipped plans:

  python tools/tws_ab_drain.py tws skew        # the headline measurement
  python tools/tws_ab_drain.py salted skew     # same-session reference tier
  python tools/tws_ab_drain.py tws balanced    # like-for-like with the r09/r10
                                               # balanced 1000x table
  python tools/tws_ab_drain.py unsalted skew   # the WALL - killed >92 min in
                                               # r10; only run with a timeout

Corpora (build first):
  balanced = spark-warehouse/scale1000x/events.parquet  (tools/scale10x.py)
  skew     = spark-warehouse/skew1000x/events.parquet   (tools/make_skew_events.py,
             59.84M of 100M rows on ONE event_type = the 60M-row hot key
             that killed the apply* drain at >92 min under a 32g heap, r10)

Each drain is one availableNow micro-batch into a memory sink (the
single-file corpus arrives as one batch — the exact r10 condition), timed
end-to-end. One JSON line per drain carries the wall time plus the final
per-type sketch rows, so cross-operator bit-identity is checked by
diffing the ``sketch`` values across runs on the same corpus.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = {
    "balanced": os.path.join(REPO, "spark-warehouse", "scale1000x"),
    "skew": os.path.join(REPO, "spark-warehouse", "skew1000x"),
}
QUERY = {
    "tws": "streaming_kmv_distinct_tws",
    "salted": "streaming_kmv_distinct_salted",
    "unsalted": "streaming_kmv_distinct",
}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "tws"
    corpus = sys.argv[2] if len(sys.argv) > 2 else "skew"
    sf_dir = CORPUS[corpus]
    if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
        sys.exit(f"corpus missing: {sf_dir}/events.parquet (see docstring)")
    if which not in QUERY:
        sys.exit(f"unknown operator {which!r} (tws | salted | unsalted)")

    import __spark_entry__ as entrymod

    from imdb_mapreduce_spark.session import get_spark

    spark = get_spark("tws_ab_drain", master="local[32]")
    spark.range(1).count()

    fn = entrymod.queries()[QUERY[which]]
    t0 = time.time()
    rows = fn(spark, sf_dir).collect()
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "operator": which,
                "query": QUERY[which],
                "corpus": corpus,
                "wall_sec": round(wall, 1),
                "rows_total": sum(r["rows_seen"] for r in rows),
                "sketch": {
                    r["event_type"]: [int(r["kth_hash"]), int(r["m"])]
                    for r in rows
                },
                "parallelism": spark.sparkContext.defaultParallelism,
            },
            sort_keys=True,
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
