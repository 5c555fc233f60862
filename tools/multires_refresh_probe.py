"""Incremental-vs-rebuild probe for the multires rollup cascade (r13).

`events_multires_rollup_incremental`'s docstring claims the hypertable
maintenance pattern's payoff: folding a batch into the three-tier state
costs O(batch + touched buckets) (+ carried-state IO), while the batch
cascade re-scans ALL raw rows. This probe measures that instead of
asserting it, on the scale10x events corpora:

  1. FULL REBUILD: the batch cascade (`events_multires_rollup`'s plan)
     over the whole factor-x table, written to a noop sink (so every
     column is computed — a count() would let Catalyst prune the sums).
  2. INCREMENTAL DRAIN: the same rows split into K ts-range batches,
     folded one by one through `multires_merge_batch` with versioned
     parquet state (the registered query's exact merge + state IO,
     minus the streaming trigger machinery, so the number isolates
     refresh cost, not checkpoint overhead).
  3. REAL-TIME READ: before the last slice is folded, time the lazy
     state-union-tail read (`events_multires_rollup_realtime`'s plan) —
     the serve-fresh-data cost must be ~(tail scan + touched buckets +
     state scan), not a rebuild.
  4. LATE CORRECTION BATCH: 1,000 rows landing in ONE minute bucket,
     folded into the FULL state — the money case: at any corpus size
     this must cost ~(touched-bucket recompute + carried-state IO),
     never a raw re-scan.

Usage: python tools/multires_refresh_probe.py [FACTOR] [K]
Prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from pyspark.sql import functions as F  # noqa: E402

from imdb_mapreduce_spark.session import get_spark  # noqa: E402
from imdb_mapreduce_spark.sources.star import load_table  # noqa: E402
from imdb_mapreduce_spark.streaming.jobs import (  # noqa: E402
    _MULTIRES_TIERS,
    multires_fold_version,
    multires_merge_batch,
)
import scale10x  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    corpus = scale10x.build_events(factor)
    spark = get_spark("multires-refresh-probe")
    events = load_table(spark, "events", corpus).select(
        "ts", "event_type", "value"
    )
    n = events.count()
    out = {"factor": factor, "rows": n, "k": k}

    # 1. full rebuild (the registered batch cascade plan, noop-sunk)
    t0 = time.time()
    full = multires_merge_batch(events, None)
    for t in _MULTIRES_TIERS:
        full[t].write.format("noop").mode("overwrite").save()
    out["rebuild_sec"] = round(time.time() - t0, 2)

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        events.repartitionByRange(k, "ts").write.parquet(src)
        parts = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
        state_root = os.path.join(d, "state")

        # 2. incremental: fold each ts-range batch, state IO included
        prev = None
        per_batch = []
        for i, p in enumerate(parts[:-1]):
            bdf = spark.read.parquet(p)
            t0 = time.time()
            prev = multires_fold_version(spark, state_root, i, bdf, prev)
            per_batch.append(round(time.time() - t0, 2))

        # 3. real-time read: the LAST slice is still raw (the tail); the
        # lazy merge over (state, tail) is the registered realtime plan,
        # noop-sunk so all three tiers compute in the one read action
        tail = spark.read.parquet(parts[-1])
        t0 = time.time()
        # the registered query's exact shape: read-time localCheckpoint
        # materializer (the broadcast-touched chains defeat exchange
        # reuse on the lazy form — measured ~3-4x single-tier cost)
        rt = multires_merge_batch(
            tail, prev,
            materialize=lambda _n, df: df.localCheckpoint(eager=True),
        )
        from imdb_mapreduce_spark.plans.events import multires_tiered_union

        multires_tiered_union(
            rt["minute"], rt["hour"], rt["day"]
        ).write.format("noop").mode("overwrite").save()
        out["realtime_read_sec"] = round(time.time() - t0, 2)

        # ...then fold the tail too so the late-correction cell runs
        # against the COMPLETE state
        t0 = time.time()
        prev = multires_fold_version(
            spark, state_root, len(parts) - 1, tail, prev
        )
        per_batch.append(round(time.time() - t0, 2))
        out["incremental_sec"] = per_batch
        out["incremental_total_sec"] = round(sum(per_batch), 2)

        # 3. late correction: 1k rows in ONE minute, against full state
        late = (
            spark.range(1_000)
            .select(
                F.lit("2026-01-01 12:34:00").cast("timestamp").alias("ts"),
                F.lit("click").alias("event_type"),
                (F.col("id") % 10).cast("double").alias("value"),
            )
        )
        t0 = time.time()
        after = multires_fold_version(spark, state_root, k, late, prev)
        out["late_batch_sec"] = round(time.time() - t0, 2)
        # the POST-correction state (the version the late fold wrote) —
        # counting `prev` here would report the state one version behind
        # the step being measured (r13 review catch)
        out["state_rows_after_late"] = {
            t: after[t].count() for t in _MULTIRES_TIERS
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
