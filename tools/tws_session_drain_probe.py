"""Scale reading for the TWS timer-session operator (r13).

`streaming_sessions_tws` is registered and oracle-green at driver SFs;
this probe gives the new operator its decade reading on the scale10x
events corpora (factor-x = x-times the users at the same per-user
behaviour, so sessions — and therefore STATE ROWS and ARMED TIMERS —
scale with the factor while per-user session shape stays fixed).

Measures the registered harness shape end to end: 4 ts-range
micro-batches + the watermark-advancing sentinel in a second drain,
emitted-session count (equals the batch sessionization count — the
cheap cross-check; the exact hash proof lives in the oracle gate), and
wall per drain. The comparison point is the BATCH sessionization
(`user_sessions`' window plan) over the same corpus: the streaming tax
buys incremental emission + timer closure, and this records what that
tax is at scale.

Usage: python tools/tws_session_drain_probe.py [FACTOR]
Prints one JSON line.
"""

from __future__ import annotations

import glob
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
from imdb_mapreduce_spark.session import get_spark  # noqa: E402
from imdb_mapreduce_spark.sources.star import load_table  # noqa: E402
from imdb_mapreduce_spark.streaming.jobs import (  # noqa: E402
    SESSION_SENTINEL_UID,
    require_tws,
    rocksdb_state_store,
    session_sentinel_df,
)
from imdb_mapreduce_spark.streaming.stateful import (  # noqa: E402
    sessions_by_timeout_tws,
)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    corpus = scale10x.build_events(factor)
    spark = get_spark("tws-session-probe")
    require_tws(spark)
    events = load_table(spark, "events", corpus).select("user_id", "ts")
    out = {"factor": factor, "rows": events.count()}

    # batch comparison point: the REGISTERED sessionization plan itself
    # (plans/events._session_intervals — the same intervals feeding
    # user_sessions / session_overlap_topk), noop-sunk; one interval row
    # per session, so its count is the session count. Reusing the
    # registered plan keeps this baseline in lockstep with the engine
    # (the r13 probe-reuse principle) instead of a hand-copy that
    # silently drifts.
    from imdb_mapreduce_spark.plans.events import _session_intervals

    t0 = time.time()
    batch = _session_intervals(spark, corpus)
    batch.write.format("noop").mode("overwrite").save()
    out["batch_window_sec"] = round(time.time() - t0, 2)
    out["batch_sessions"] = batch.count()

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        events.repartitionByRange(4, "ts").write.parquet(src)
        for i, p in enumerate(
            sorted(glob.glob(os.path.join(src, "part-*.parquet")))
        ):
            os.utime(p, (1_000_000 + i, 1_000_000 + i))
        sink_dir = os.path.join(d, "out")
        ckpt = os.path.join(d, "ckpt")

        def drain() -> float:
            stream = (
                spark.readStream.schema(events.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )

            def sink(df, _id):
                df.write.mode("append").parquet(sink_dir)

            t0 = time.time()
            q = (
                sessions_by_timeout_tws(stream)
                .writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return round(time.time() - t0, 2)

        with rocksdb_state_store(spark):
            out["stream_drain_sec"] = drain()
            sent = session_sentinel_df(spark, events)
            if sent is not None:  # empty corpus -> nothing to flush
                sent.coalesce(1).write.mode("append").parquet(src)
                out["sentinel_flush_sec"] = drain()
        emitted = spark.read.parquet(sink_dir).filter(
            F.col("user_id") != SESSION_SENTINEL_UID
        )
        out["stream_sessions"] = emitted.count()
        out["sessions_agree"] = (
            out["stream_sessions"] == out["batch_sessions"]
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
