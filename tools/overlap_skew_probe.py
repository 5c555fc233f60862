"""Hot-bin skew probe for overlap_join_binned (SCALING.md r12).

The operator's docstring claims a hot bin (everything overlapping one
epoch) is ordinary data skew that AQE's skew-join split handles on the
shuffled side. This probe measures that claim instead of asserting it:
a synthetic interval corpus with one pathological hour (HOT point
intervals all inside a single W=1h bin → HOT² candidate pairs in ONE
join partition) over a uniform background, self-joined with broadcast
disabled so the plan is a shuffled join on the bin id, with AQE
skew-join ON vs OFF.

Count() consumes the pair stream without materializing it, so the
measurement isolates probe/emit cost — the same shape the registered
top-k query puts behind TakeOrdered.

Usage: python tools/overlap_skew_probe.py [HOT] [BG]
Prints one JSON line with wall seconds per config and the (identical)
pair counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from imdb_mapreduce_spark.operators.temporal import (  # noqa: E402
    overlap_join_binned,
)
from imdb_mapreduce_spark.session import get_spark  # noqa: E402

W_US = 3_600_000_000  # 1 h bins
HORIZON_US = 30 * 86_400_000_000  # 30 days


def corpus(spark, hot: int, bg: int):
    """`hot` point intervals uniform inside ONE hour + `bg` short
    intervals uniform over 30 days. Deterministic (id-derived)."""
    hot_df = spark.range(hot).select(
        F.col("id").alias("iid"),
        (F.lit(10 * W_US) + F.pmod(F.xxhash64("id"), F.lit(W_US))).alias("s"),
    )
    bg_df = spark.range(bg).select(
        (F.col("id") + 1_000_000_000).alias("iid"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(HORIZON_US)).alias("s"),
    )
    both = hot_df.unionByName(bg_df)
    return both.select("iid", "s", (F.col("s") + 60_000_000).alias("e"))


def run(spark, iv, tag: str, bin_width: int = W_US, **kw):
    a = iv.select(
        F.col("iid").alias("lid"), F.col("s").alias("ls"), F.col("e").alias("le")
    )
    b = iv.select(
        F.col("iid").alias("rid"), F.col("s").alias("rs"), F.col("e").alias("re")
    )
    pairs = overlap_join_binned(
        a, b, bin_width=bin_width,
        l_start="ls", l_end="le", r_start="rs", r_end="re", **kw
    ).filter(F.col("lid") < F.col("rid"))
    t0 = time.time()
    n = pairs.count()
    return {"config": tag, "sec": round(time.time() - t0, 2), "pairs": n}


def main() -> None:
    hot = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    bg = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("overlap-skew-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    iv = corpus(spark, hot, bg)
    iv.count()  # materialize-side warm (source is generated, not read)
    out = {"hot": hot, "bg": bg, "runs": []}
    for skew in ("true", "false", "true"):  # A/B/A to expose order effects
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew)
        out["runs"].append(run(spark, iv, f"skewJoin={skew}"))
        print(out["runs"][-1], file=sys.stderr)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # the operator's own targeted mitigation: salt bins whose population
    # exceeds the threshold; the hot bin fans out to N reducers
    for salts in (8, 32):
        out["runs"].append(
            run(
                spark, iv, f"hot_bin_salts={salts}",
                hot_bin_threshold=10_000, hot_bin_salts=salts,
            )
        )
        print(out["runs"][-1], file=sys.stderr)
    # the REGISTERED path (r13): the full auto-plan — W, budget, and the
    # hot-bin threshold all derived from suggest_overlap_plan's single
    # aggregate, exactly what session_overlap_topk passes. The acceptance
    # bar (VERDICT r12 item 3): within ~2× of the hand-set 32-salt drain.
    from imdb_mapreduce_spark.operators.temporal import suggest_overlap_plan

    plan = suggest_overlap_plan(iv, "s", "e")
    out["auto_plan"] = plan._asdict()
    out["runs"].append(
        run(
            spark, iv, "auto_plan",
            bin_width=plan.bin_width,
            max_bins_per_row=plan.max_bins_per_row,
            hot_bin_threshold=plan.hot_bin_threshold,
            hot_bin_salts=plan.hot_bin_salts,
            hot_bin_sides="left",
        )
    )
    print(out["runs"][-1], file=sys.stderr)
    counts = {r["pairs"] for r in out["runs"]}
    out["counts_agree"] = len(counts) == 1
    print(json.dumps(out))


if __name__ == "__main__":
    main()
