"""Interleaved A/B: un-chain the ADDITIVE erasure query's coarse tiers
(r15 opt session 3 — the additive sibling of tools/erasure_coarse_ab.py).

Arm A (registered): pre-erasure day state derives from the lazy hour
state (`_erasure_sum_merge(prev_hour)`), and the repair derives day
from the lazy repaired HOUR tier — so the hour aggregates are evaluated
twice inside the single readout action (broadcast probes between the
branches defeat ReuseExchange).
Arm B (candidate): prev day from the pinned minute state directly, and
both repaired coarse tiers from the pinned repaired minute tier —
independent branches, each aggregate evaluated once. Outputs identical
(decimal sums associative; counts additive).

Usage: python tools/rollup_erasure_chain_ab.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from imdb_mapreduce_spark.session import get_spark  # noqa: E402
from imdb_mapreduce_spark.plans.events import (  # noqa: E402
    _ERASURE_DEC,
    _erased_col,
    _erasure_sum_merge,
    _events,
    multires_tiered_union,
)
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 6


def run_new(spark) -> int:
    e = _events(spark, SF_DIR).select("ts", "event_type", "value", "user_id")
    rows = e.select(
        F.date_trunc("minute", F.col("ts")).alias("bucket"),
        "event_type",
        F.lit(1).cast("long").alias("n_events"),
        F.coalesce(
            F.col("value").cast("decimal(12,2)").cast(_ERASURE_DEC),
            F.lit(0).cast(_ERASURE_DEC),
        ).alias("s"),
        _erased_col().alias("_erased"),
    )
    m = _erasure_sum_merge(rows.drop("_erased"), "minute").localCheckpoint(
        eager=True
    )
    prev = {
        "minute": m,
        "hour": _erasure_sum_merge(m, "hour"),
        "day": _erasure_sum_merge(m, "day"),  # direct, not via hour
    }
    neg = _erasure_sum_merge(rows.filter(F.col("_erased")), "minute").select(
        "bucket",
        "event_type",
        (-F.col("n_events")).cast("long").alias("n_events"),
        (-F.col("s")).cast(_ERASURE_DEC).alias("s"),
    )
    touched = neg.select("bucket").distinct()
    t = F.broadcast(touched.select(F.col("bucket").alias("_tb")))
    hot = prev["minute"].join(
        t, F.col("bucket").eqNullSafe(F.col("_tb")), "left_semi"
    )
    cold = prev["minute"].join(
        t, F.col("bucket").eqNullSafe(F.col("_tb")), "left_anti"
    )
    repaired = _erasure_sum_merge(hot.unionByName(neg), "minute").filter(
        F.col("n_events") > 0
    )
    m2 = cold.unionByName(repaired).localCheckpoint(eager=True)
    tiers = {"minute": m2}
    for unit in ("hour", "day"):
        tc = F.broadcast(
            touched.select(
                F.date_trunc(unit, F.col("bucket")).alias("_tb")
            ).distinct()
        )
        derived = _erasure_sum_merge(
            m2.join(
                tc,
                F.date_trunc(unit, F.col("bucket")).eqNullSafe(F.col("_tb")),
                "left_semi",
            ),
            unit,
        )
        carried = prev[unit].join(
            tc, F.col("bucket").eqNullSafe(F.col("_tb")), "left_anti"
        )
        tiers[unit] = carried.unionByName(derived)
    out = multires_tiered_union(tiers["minute"], tiers["hour"], tiers["day"])
    return len(out.collect())


def main() -> None:
    spark = get_spark("rollup-erasure-chain-ab")
    spark.range(1).count()
    old_fn = entrymod.queries()["events_rollup_user_erasure"]

    def run_old() -> int:
        return len(old_fn(spark, SF_DIR).collect())

    res: dict[str, list[float]] = {"old": [], "new": []}
    rows: dict[str, int] = {}
    run_old(), run_new(spark)  # warm (untimed)
    for _ in range(REPS):
        for arm, fn in (("old", run_old), ("new", lambda: run_new(spark))):
            t = time.monotonic()
            rows[arm] = fn()
            res[arm].append(round(time.monotonic() - t, 3))
    assert rows["old"] == rows["new"], rows
    print(
        f"rows={rows['old']:5d} "
        f"old min={min(res['old']):.3f} med={sorted(res['old'])[REPS//2]:.3f} {res['old']} "
        f"new min={min(res['new']):.3f} med={sorted(res['new'])[REPS//2]:.3f} {res['new']}"
    )


if __name__ == "__main__":
    main()
