"""TWS bridge-ceiling sharding A/B (r15, VERDICT r14 item 4).

SCALING.md r14 measured the TWS session drain at a ~105k rows/s
per-drain ceiling and CLAIMED the ceiling is per-task ("embarrassingly
parallel in the key hash") without measuring it. This probe runs the
SAME drain over the SAME corpus at state-partition counts 1 / 4 / 16
(spark.sql.shuffle.partitions pins the stateful operator's partition
count for each fresh checkpoint) and records wall + rows/s per setting,
plus the emitted-session count (which must be invariant under
sharding — the correctness half of the claim).

local[32] caveat, stated up front: every setting shares one JVM and one
host's 32 cores, so this demonstrates that throughput scales with the
NUMBER OF PARALLEL STATE TASKS (the protocol bridge is per-task, not
global) — the cross-machine executor extrapolation rests on Spark's
hash partitioning of the key space, which is the same mechanism.

Usage: python tools/tws_shard_probe.py [FACTOR] [PARTS ...]
Prints one JSON line per partition setting.
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
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    parts_list = [int(a) for a in sys.argv[2:]] or [1, 4, 16]
    corpus = scale10x.build_events(factor)
    spark = get_spark("tws-shard-probe")
    require_tws(spark)
    events = load_table(spark, "events", corpus).select("user_id", "ts")
    n_rows = events.count()
    session_counts: dict[int, int] = {}

    for parts in parts_list:
        # a FRESH checkpoint adopts the current shuffle-partition conf as
        # its state-partition count — the per-setting isolation the A/B
        # needs without restarting the JVM
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
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
                main_sec = drain()
                sent = session_sentinel_df(spark, events)
                flush_sec = None
                if sent is not None:
                    sent.coalesce(1).write.mode("append").parquet(src)
                    flush_sec = drain()
                n_sessions = (
                    spark.read.parquet(sink_dir)
                    .filter(F.col("user_id") != SESSION_SENTINEL_UID)
                    .count()
                )
            session_counts[parts] = n_sessions
            print(
                json.dumps(
                    {
                        "factor": factor,
                        "rows": n_rows,
                        "state_partitions": parts,
                        "drain_sec": main_sec,
                        "sentinel_flush_sec": flush_sec,
                        "rows_per_sec": round(n_rows / main_sec),
                        "sessions": n_sessions,
                    }
                ),
                flush=True,
            )
    assert len(set(session_counts.values())) == 1, (
        f"session count varies with sharding: {session_counts}"
    )


if __name__ == "__main__":
    main()
