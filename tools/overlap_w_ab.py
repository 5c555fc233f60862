"""Bin-width A/B for the binned interval overlap join (SCALING.md r12).

The operator's candidate volume obeys a simple law: with n sessions
uniformly over time horizon T and bin width W, candidates per bin are
(n·W/T)² across T/W bins → total ≈ n²·W/T. DOUBLING density quadruples
candidates, but HALVING W halves them — bin width is the linear lever
that pays for quadratic density growth (until W shrinks below typical
interval length and the per-interval explode factor takes over).

This probe measures session_overlap_topk's plan at the synthetic decade
corpora (tools/scale10x.py build_events) under different bin widths,
so the SCALING.md table records the law instead of asserting it.

Usage: python tools/overlap_w_ab.py DIR W_SECONDS [W_SECONDS ...]
Prints one JSON line: per-W wall seconds (single observation, the
established drain allowance for long probes) + the top-1 row as a
cross-W result check (top-k must be W-invariant).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from imdb_mapreduce_spark.functions.columns import epoch_us  # noqa: E402
from imdb_mapreduce_spark.operators.temporal import (  # noqa: E402
    overlap_join_binned,
)
from imdb_mapreduce_spark.session import get_spark  # noqa: E402
from imdb_mapreduce_spark.sources.star import load_table  # noqa: E402


def run(spark, sf_dir: str, w_us: int):
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    is_new = (
        prev_ts.isNull()
        | (epoch_us("ts") - epoch_us(prev_ts) > 30 * 60 * 1_000_000)
    ).cast("int")
    iv = (
        e.select("user_id", "event_id", "ts", is_new.alias("is_new"))
        .select("user_id", "ts", F.sum("is_new").over(wf).alias("session_no"))
        .groupBy("user_id", "session_no")
        .agg(
            epoch_us(F.min("ts")).alias("start_us"),
            epoch_us(F.max("ts")).alias("end_us"),
        )
    )
    a = iv.select(
        F.col("user_id").alias("user1"),
        F.col("session_no").alias("session1"),
        F.col("start_us").alias("start1"),
        F.col("end_us").alias("end1"),
    )
    b = iv.select(
        F.col("user_id").alias("user2"),
        F.col("session_no").alias("session2"),
        F.col("start_us").alias("start2"),
        F.col("end_us").alias("end2"),
    )
    pairs = overlap_join_binned(
        a, b, bin_width=w_us,
        l_start="start1", l_end="end1", r_start="start2", r_end="end2",
    ).filter(F.col("user1") < F.col("user2"))
    return (
        pairs.select(
            "user1", "session1", "user2", "session2",
            (F.least("end1", "end2") - F.greatest("start1", "start2")).alias(
                "overlap_us"
            ),
        )
        .orderBy(F.desc("overlap_us"), "user1", "session1", "user2", "session2")
        .limit(50)
    )


def main() -> None:
    sf_dir = sys.argv[1]
    ws = [int(s) for s in sys.argv[2:]] or [3600, 300]
    spark = get_spark("overlap-w-ab")
    out = {"dir": sf_dir, "runs": []}
    for w_sec in ws:
        t0 = time.time()
        rows = run(spark, sf_dir, w_sec * 1_000_000).collect()
        dt = round(time.time() - t0, 2)
        top1 = list(rows[0]) if rows else None
        out["runs"].append({"w_sec": w_sec, "sec": dt, "rows": len(rows), "top1": top1})
        print(f"W={w_sec}s: {dt}s, {len(rows)} rows", file=sys.stderr)
    tops = {json.dumps(r["top1"]) for r in out["runs"]}
    out["topk_w_invariant"] = len(tops) == 1
    print(json.dumps(out))


if __name__ == "__main__":
    main()
