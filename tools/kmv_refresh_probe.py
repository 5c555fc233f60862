"""Incremental-vs-rebuild probe for the NON-additive (KMV sketch)
rollup (r14, VERDICT r13 item 4's scale evidence).

`events_multires_distinct_incremental` folds per-batch KMV arrays into
the versioned three-tier state via `multires_kmv_merge_batch`; the
claim inherited from the additive tier is that a fold costs
O(batch + touched buckets · K) (+ carried-state IO) while the batch
cascade re-scans ALL raw rows. Same probe shape as
`tools/multires_refresh_probe.py`, sketch monoid instead of count/sum:

  1. FULL REBUILD: the sketch cascade (`events_multires_distinct_rollup`'s
     plan) over the whole factor-x table, noop sink.
  2. INCREMENTAL DRAIN: the same rows split into K ts-range batches,
     folded one by one through `multires_kmv_merge_batch` with
     versioned parquet state (the registered query's exact merge +
     state IO, minus the streaming trigger machinery).
  3. REAL-TIME READ: before the last slice is folded, time the
     state ⊎ tail union (`events_multires_distinct_realtime`'s plan —
     `multires_kmv_merge_batch` with the localCheckpoint materializer)
     — the serve-fresh-data cost must be ~(tail sketch + touched
     bucket merges + state scan), not a rebuild.
  4. LATE CORRECTION BATCH: 1,000 rows landing in ONE minute bucket,
     folded into the FULL state — the money case: at any corpus size
     this must cost ~(touched-bucket sketch merge + carried-state IO),
     never a raw re-scan.

Usage: python tools/kmv_refresh_probe.py [FACTOR] [K]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from pyspark.sql import functions as F  # noqa: E402

import scale10x  # noqa: E402
from imdb_mapreduce_spark.plans.events import (  # noqa: E402
    kmv_k_smallest,
    kmv_merge_up,
    kmv_minute_pairs,
)
from imdb_mapreduce_spark.session import get_spark  # noqa: E402
from imdb_mapreduce_spark.sources.star import load_table  # noqa: E402
from imdb_mapreduce_spark.streaming.jobs import (  # noqa: E402
    _MULTIRES_TIERS,
    multires_fold_version,
    multires_kmv_merge_batch,
)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    corpus = scale10x.build_events(factor)
    spark = get_spark("kmv-refresh-probe")
    events = load_table(spark, "events", corpus).select("ts", "user_id")
    out: dict[str, object] = {"factor": factor, "k_batches": k,
                              "rows": events.count()}

    # 1. full rebuild: the registered cascade plan (minute checkpointed
    # once, hour/day derived) — count() is fine here: the sketch array
    # IS the aggregate, nothing prunable
    t0 = time.monotonic()
    m = kmv_k_smallest(kmv_minute_pairs(events)).localCheckpoint(eager=True)
    h = kmv_merge_up(m, "hour")
    d = kmv_merge_up(h, "day")
    out["rebuild_rows"] = m.unionByName(h).unionByName(d).count()
    out["rebuild_sec"] = round(time.monotonic() - t0, 2)

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        events.repartitionByRange(k, "ts").write.parquet(src)
        import glob as _glob

        parts = sorted(_glob.glob(os.path.join(src, "part-*.parquet")))
        state_root = os.path.join(tmp, "state")

        # 2. incremental: fold each ts-range batch, state IO included
        # (all but the last slice, which step 3 reads as the raw tail)
        prev = None
        folds = []
        for i, p in enumerate(parts[:-1]):
            bdf = spark.read.parquet(p)
            t0 = time.monotonic()
            prev = multires_fold_version(
                spark, state_root, i, bdf, prev,
                merge_fn=multires_kmv_merge_batch,
            )
            folds.append(round(time.monotonic() - t0, 2))

        # 3. real-time read: state ⊎ unfolded tail, the registered
        # query's exact shape (read-time localCheckpoint materializer)
        tail = spark.read.parquet(parts[-1])
        t0 = time.monotonic()
        rt = multires_kmv_merge_batch(
            tail, prev,
            materialize=lambda _n, df: df.localCheckpoint(eager=True),
        )
        out["realtime_rows"] = {t: rt[t].count() for t in _MULTIRES_TIERS}
        out["realtime_read_sec"] = round(time.monotonic() - t0, 2)

        # ...then fold the tail too so the late-correction cell runs
        # against the FULL state
        t0 = time.monotonic()
        prev = multires_fold_version(
            spark, state_root, len(parts) - 1, tail, prev,
            merge_fn=multires_kmv_merge_batch,
        )
        folds.append(round(time.monotonic() - t0, 2))
        out["fold_secs"] = folds
        out["fold_total_sec"] = round(sum(folds), 2)

        # 4. late correction: 1,000 rows in ONE minute bucket
        lo = events.select(F.min("ts").alias("lo")).first()["lo"]
        late = spark.range(1000).select(
            F.lit(lo).alias("ts"),
            (F.col("id") + 10_000_000_000).alias("user_id"),
        )
        t0 = time.monotonic()
        after = multires_fold_version(
            spark, state_root, len(parts), late, prev,
            merge_fn=multires_kmv_merge_batch,
        )
        out["late_fold_sec"] = round(time.monotonic() - t0, 2)
        out["state_rows"] = {
            tier: after[tier].count() for tier in _MULTIRES_TIERS
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
