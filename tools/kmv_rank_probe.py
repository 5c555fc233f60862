"""Flash-crowd probe for the KMV distinct-rollup's minute tier
(SCALING.md r14, VERDICT r13 "what's wrong" item 2).

The r13 minute tier ranked ALL distinct (bucket, hash) pairs per bucket
through one `row_number` window task — correct, but a flash-crowd
minute (U distinct users in ONE bucket, the exact geometry the overlap
join's hot-bin salting exists for) funnels U rows into a single task's
sort to keep 64. The r14 `kmv_k_smallest` is two-level: partial
k-smallest arrays per (bucket, input-partition), merged by the same KMV
merge law the hour/day tiers use, so no task ever sorts more than one
partition's share of a bucket. This probe measures the A/B on the crowd
geometry instead of asserting it: CROWD distinct users all inside one
minute, over a uniform multi-day background.

Both shapes produce the identical sketch (the merge law); the probe
asserts that on the full tier output before timing.

Usage: python tools/kmv_rank_probe.py [CROWD] [BG]
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
    kmv_k_smallest,
    kmv_merge_up,
    kmv_minute_pairs,
)
from imdb_mapreduce_spark.plans.quality import KMV_K  # noqa: E402
from imdb_mapreduce_spark.session import get_spark  # noqa: E402


def corpus(spark, crowd: int, bg: int):
    """`crowd` distinct users all in ONE minute + `bg` events from a
    uniform user pool over 30 days. Deterministic (id-derived)."""
    crowd_df = spark.range(crowd).select(
        F.col("id").alias("user_id"),
        F.timestamp_micros(
            F.lit(10 * 86_400_000_000) + F.pmod(F.xxhash64("id"), F.lit(60_000_000))
        ).alias("ts"),
    )
    bg_df = spark.range(bg).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)).alias("user_id"),
        F.timestamp_micros(
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(30 * 86_400_000_000))
        ).alias("ts"),
    )
    return crowd_df.unionByName(bg_df)


def window_rank_k_smallest(pairs):
    """The r13 shape, kept here verbatim for the A/B: pre-distinct (the
    r13 `kmv_minute_pairs` ended in `.distinct()`) + one per-bucket
    row_number window — a flash-crowd bucket's full distinct set sorts
    in ONE task. The r14 shape folds the dedup into its salted sort, so
    the distinct's shuffle is charged to the shape that needs it."""
    w = Window.partitionBy("bucket").orderBy("h")
    return (
        pairs.distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= KMV_K)
        .groupBy("bucket")
        .agg(F.sort_array(F.collect_list("h")).alias("hashes"))
    )


def full_tier(pairs, minute_fn):
    m = minute_fn(pairs)
    h = kmv_merge_up(m, "hour")
    d = kmv_merge_up(h, "day")
    return m.unionByName(h).unionByName(d)


def fingerprint(df):
    """Order-insensitive digest of the complete sketch set."""
    return df.select(
        F.count("*").alias("n"),
        F.sum(F.crc32(F.concat_ws(",", F.col("bucket").cast("string"),
                                  F.concat_ws("|", "hashes")))).alias("sig"),
    ).first().asDict()


def main() -> None:
    crowd = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    bg = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    spark = get_spark()
    e = corpus(spark, crowd, bg)
    # Stage the RAW pairs to parquet (hash projection only): each shape
    # then pays its own dedup+rank — the r13 shape its distinct shuffle
    # + single-task window sort, the r14 shape its one salted
    # sort-with-inline-dedup — while the shared raw-scan/md5 cost stays
    # out of the A/B. Parquet, not localCheckpoint: a 50M-row cached
    # corpus evicts/OOMs the 8g local driver heap and the memory
    # pressure pollutes the very timings the probe reads.
    import atexit
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    atexit.register(shutil.rmtree, tmp, True)
    pairs_path = os.path.join(tmp, "pairs")
    kmv_minute_pairs(e).write.parquet(pairs_path)
    pairs = spark.read.parquet(pairs_path)

    out: dict[str, object] = {"crowd": crowd, "bg": bg, "kmv_k": KMV_K}
    # salt_64k = the width a 2048-partition cluster's derivation picks
    # (32× partitions): r15's recursion cell — ABOVE `_KMV_L2_FANIN`,
    # so level 2 folds through one more salted rank instead of
    # collecting salt·K (= 4.2M) longs of the crowd bucket in one task
    # (ADVICE r14). Same fingerprint by the merge law.
    shapes = {
        "window_rank_r13": window_rank_k_smallest,
        "two_level_merge_r14": kmv_k_smallest,
        "salt_64k_recursive_r15": lambda p: kmv_k_smallest(p, salt=65536),
    }
    sigs = {}
    for name, fn in shapes.items():
        t0 = time.monotonic()
        sigs[name] = fingerprint(full_tier(pairs, fn))
        out[f"{name}_sec"] = round(time.monotonic() - t0, 2)
    assert sigs["window_rank_r13"] == sigs["two_level_merge_r14"], sigs
    assert sigs["salt_64k_recursive_r15"] == sigs["two_level_merge_r14"], sigs
    out["fingerprint"] = sigs["two_level_merge_r14"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
