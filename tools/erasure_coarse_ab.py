"""Interleaved A/B of the erasure repair's COARSE-TIER derivation
(r15 opt round, session 3).

Arm A (current registered shape): hour derives from the repaired minute
tier, day from the HOUR tier (chained), and the carried day side from
merge_up(merge_up(prev_m)) — so the hour merge-up subtree is evaluated
twice inside the single readout action (once for the hour readout, once
under day), separated by broadcast semi/anti probes that defeat
ReuseExchange.

Arm B (candidate): hour AND day each derive directly from the pinned
repaired minute tier, and each carried coarse side directly from the
pinned prev_m — all four coarse subtrees independent and evaluated once.
Outputs identical by the associative merge law (day-from-minute ≡
day-from-hour: any element of a day's K-set ranks ≤ K in its own child,
multiplicity kept for the sample monoid).

Usage: python tools/erasure_coarse_ab.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from imdb_mapreduce_spark.session import get_spark  # noqa: E402
from imdb_mapreduce_spark.plans.events import (  # noqa: E402
    _erased_col,
    _events,
    bottomk_merge_up,
    bottomk_sample,
    kmv_bucket_stats,
    kmv_k_smallest,
    kmv_merge_up,
    kmv_minute_pairs,
    qtl_bucket_stats,
    qtl_minute_pairs,
    sample_erasure_repair,
    sketch_erasure_repair,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 6


def _coarse_independent(
    tiers_minute: DataFrame,
    prev_m: DataFrame,
    touched: DataFrame,
    merge_up_fn,
) -> dict[str, DataFrame]:
    """Arm B's coarse tiers: derived from pinned m2, carried from pinned
    prev_m, both direct-to-unit."""
    tiers = {"minute": tiers_minute}
    for unit in ("hour", "day"):
        tc = F.broadcast(
            touched.select(F.date_trunc(unit, F.col("bucket")).alias("_tb"))
        )
        derived = merge_up_fn(
            tiers_minute.join(
                tc,
                F.date_trunc(unit, F.col("bucket")).eqNullSafe(F.col("_tb")),
                "left_semi",
            ),
            unit,
        )
        carried = merge_up_fn(prev_m, unit).join(
            tc, F.col("bucket").eqNullSafe(F.col("_tb")), "left_anti"
        )
        tiers[unit] = carried.unionByName(derived)
    return tiers


def sketch_repair_new(e, prev_m, erased):
    erased_pairs = kmv_minute_pairs(e.filter(erased))
    touched = (
        erased_pairs.alias("p")
        .join(
            prev_m.alias("s"),
            F.col("p.bucket").eqNullSafe(F.col("s.bucket")),
            "inner",
        )
        .filter(F.array_contains(F.col("s.hashes"), F.col("p.h")))
        .select(F.col("p.bucket").alias("bucket"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    t = F.broadcast(touched.select(F.col("bucket").alias("_tb")))
    remaining_touched = e.filter(~erased).join(
        t,
        F.date_trunc("minute", F.col("ts")).eqNullSafe(F.col("_tb")),
        "left_semi",
    )
    rederived = kmv_k_smallest(kmv_minute_pairs(remaining_touched))
    carried_m = prev_m.join(
        t, F.col("bucket").eqNullSafe(F.col("_tb")), "left_anti"
    )
    m2 = carried_m.unionByName(rederived).localCheckpoint(eager=True)
    return _coarse_independent(m2, prev_m, touched, kmv_merge_up)


def sample_repair_new(e, prev_m, erased):
    erased_uh = (
        e.filter(erased)
        .filter(F.col("user_id").isNotNull())
        .select(
            F.date_trunc("minute", F.col("ts")).alias("bucket"),
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("bigint")
            .alias("uh"),
        )
        .distinct()
    )
    touched = (
        erased_uh.alias("p")
        .join(
            prev_m.alias("s"),
            F.col("p.bucket").eqNullSafe(F.col("s.bucket")),
            "inner",
        )
        .filter(
            F.exists(F.col("s.sample"), lambda x: x["uh"] == F.col("p.uh"))
        )
        .select(F.col("p.bucket").alias("bucket"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    t = F.broadcast(touched.select(F.col("bucket").alias("_tb")))
    remaining_touched = e.filter(~erased).join(
        t,
        F.date_trunc("minute", F.col("ts")).eqNullSafe(F.col("_tb")),
        "left_semi",
    )
    rederived = bottomk_sample(qtl_minute_pairs(remaining_touched))
    carried_m = prev_m.join(
        t, F.col("bucket").eqNullSafe(F.col("_tb")), "left_anti"
    )
    m2 = carried_m.unionByName(rederived).localCheckpoint(eager=True)
    return _coarse_independent(m2, prev_m, touched, bottomk_merge_up)


def main() -> None:
    spark = get_spark("erasure-coarse-ab")
    spark.range(1).count()

    fams = {
        "distinct": dict(
            cols=("ts", "user_id"),
            pairs_fn=kmv_minute_pairs,
            sketch_fn=kmv_k_smallest,
            repair_old=sketch_erasure_repair,
            repair_new=sketch_repair_new,
            stats=kmv_bucket_stats,
        ),
        "quantile": dict(
            cols=("ts", "event_id", "user_id", "value"),
            pairs_fn=qtl_minute_pairs,
            sketch_fn=bottomk_sample,
            repair_old=sample_erasure_repair,
            repair_new=sample_repair_new,
            stats=qtl_bucket_stats,
        ),
    }

    for fam, cfg in fams.items():
        e = _events(spark, SF_DIR).select(*cfg["cols"])
        prev_m = cfg["sketch_fn"](cfg["pairs_fn"](e)).localCheckpoint(
            eager=True
        )
        erased = _erased_col()

        def run(repair) -> int:
            tiers = repair(e, prev_m, erased)
            out = (
                cfg["stats"](tiers["minute"], "minute")
                .unionByName(cfg["stats"](tiers["hour"], "hour"))
                .unionByName(cfg["stats"](tiers["day"], "day"))
            )
            return out.count()

        res: dict[str, list[float]] = {"old": [], "new": []}
        rows: dict[str, int] = {}
        run(cfg["repair_old"]), run(cfg["repair_new"])  # warm (untimed)
        for _ in range(REPS):
            for arm in ("old", "new"):
                t = time.monotonic()
                rows[arm] = run(cfg[f"repair_{arm}"])
                res[arm].append(round(time.monotonic() - t, 3))
        assert rows["old"] == rows["new"], (fam, rows)
        print(
            f"{fam:9s} rows={rows['old']:5d} "
            f"old min={min(res['old']):.3f} med={sorted(res['old'])[REPS//2]:.3f} {res['old']} "
            f"new min={min(res['new']):.3f} med={sorted(res['new'])[REPS//2]:.3f} {res['new']}"
        )


if __name__ == "__main__":
    main()
