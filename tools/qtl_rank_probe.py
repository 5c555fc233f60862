"""Flash-crowd probe for the QUANTILE rollup's minute tier (r15).

`bottomk_sample` inherits `kmv_k_smallest`'s two-level salted-rank shape
but sorts (h, v, uh) STRUCT rows, not bare longs, keeps multiplicity
(no dedup pass), and keeps QTL_K=128 rather than 64 — so the KMV
probe's readings don't transfer automatically. This probe measures the
same A/B on the same crowd geometry: CROWD rows all inside one minute
(the flash-crowd funnel a naive per-bucket window rank sorts in ONE
task), over a uniform multi-day background.

All shapes produce the identical sample set (the bottom-K multiset
merge law); the probe asserts that on the full tier output before
timing.

Usage: python tools/qtl_rank_probe.py [CROWD] [BG]
Prints one JSON line with wall seconds per shape and the (identical)
tier fingerprints.
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

from imdb_mapreduce_spark.plans.events import (  # noqa: E402
    QTL_K,
    bottomk_merge_up,
    bottomk_sample,
    qtl_minute_pairs,
)
from imdb_mapreduce_spark.session import get_spark  # noqa: E402


def corpus(spark, crowd: int, bg: int):
    """`crowd` rows all in ONE minute + `bg` rows over 30 days.
    Deterministic (id-derived); every row a distinct event_id."""
    crowd_df = spark.range(crowd).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1_000_000)).alias("user_id"),
        (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(100_000)) / 100.0).alias(
            "value"
        ),
        F.timestamp_micros(
            F.lit(10 * 86_400_000_000)
            + F.pmod(F.xxhash64("id"), F.lit(60_000_000))
        ).alias("ts"),
    )
    bg_df = spark.range(bg).select(
        (F.col("id") + F.lit(1 << 40)).alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)).alias("user_id"),
        (F.pmod(F.xxhash64("id", F.lit(5)), F.lit(100_000)) / 100.0).alias(
            "value"
        ),
        F.timestamp_micros(
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(30 * 86_400_000_000))
        ).alias("ts"),
    )
    return crowd_df.unionByName(bg_df)


def window_rank_sample(pairs):
    """The naive shape, kept here for the A/B: one per-bucket
    row_number window — a flash-crowd bucket's full row set sorts in
    ONE task — then the same collect."""
    w = Window.partitionBy("bucket").orderBy("h", "v", "uh")
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= QTL_K)
        .groupBy("bucket")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.struct("h", "v", "uh"))),
                1,
                QTL_K,
            ).alias("sample")
        )
    )


def full_tier(pairs, minute_fn):
    m = minute_fn(pairs)
    h = bottomk_merge_up(m, "hour")
    d = bottomk_merge_up(h, "day")
    return m.unionByName(h).unionByName(d)


def fingerprint(df):
    """Order-insensitive digest of the complete sample set (hash lists
    carry the full sample identity; v/uh ride along via h's row-unique
    construction)."""
    return (
        df.select(
            F.count("*").alias("n"),
            F.sum(
                F.crc32(
                    F.concat_ws(
                        ",",
                        F.col("bucket").cast("string"),
                        F.concat_ws(
                            "|",
                            F.transform(
                                "sample",
                                lambda x: F.concat_ws(
                                    ":",
                                    x["h"].cast("string"),
                                    x["v"].cast("string"),
                                ),
                            ),
                        ),
                    )
                )
            ).alias("sig"),
        )
        .first()
        .asDict()
    )


def main() -> None:
    crowd = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    bg = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark()
    e = corpus(spark, crowd, bg)
    # Stage the RAW pairs to parquet (projection only): each shape then
    # pays its own rank — parquet, not localCheckpoint, for the same
    # heap-pressure reason as the KMV probe.
    import atexit
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    atexit.register(shutil.rmtree, tmp, True)
    pairs_path = os.path.join(tmp, "pairs")
    qtl_minute_pairs(e).write.parquet(pairs_path)
    pairs = spark.read.parquet(pairs_path)

    out: dict[str, object] = {"crowd": crowd, "bg": bg, "qtl_k": QTL_K}
    # salt_64k: the width a 2048-partition cluster's derivation picks —
    # far above `_QTL_L2_FANIN` (1024), so the recursion engages and no
    # level-2 task collects salt·K structs.
    shapes = {
        "window_rank_naive": window_rank_sample,
        "two_level_merge": bottomk_sample,
        "salt_64k_recursive": lambda p: bottomk_sample(p, salt=65536),
    }
    # Three interleaved rounds, per-shape MIN: a single sequential pass
    # confounds the A/B with JIT/page-cache warm-up (a repeat of the
    # FIRST shape at the end of a cold sequential pass measured 12×
    # faster than its own first reading on this box) — same
    # min-of-first-N discipline as bench.py.
    sigs: dict[str, object] = {}
    times: dict[str, float] = {}
    for _round in range(3):
        for name, fn in shapes.items():
            t0 = time.monotonic()
            sigs[name] = fingerprint(full_tier(pairs, fn))
            dt = time.monotonic() - t0
            times[name] = min(times.get(name, float("inf")), dt)
    for name, dt in times.items():
        out[f"{name}_sec"] = round(dt, 2)
    assert sigs["window_rank_naive"] == sigs["two_level_merge"], sigs
    assert sigs["salt_64k_recursive"] == sigs["two_level_merge"], sigs
    out["fingerprint"] = sigs["two_level_merge"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
