"""Phase-level profile of the realtime hypertable fixture (r15 opt).

Times each phase of events_multires_rollup_realtime's body separately —
staging write, each fold (and each fold's per-tier action), read leg —
so the optimization targets the measured cost, not the guessed one
(guide §1). Run on an otherwise idle box:

    python tools/realtime_phase_profile.py [sf_dir] [reps]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from imdb_mapreduce_spark.session import get_spark  # noqa: E402
from imdb_mapreduce_spark.sources.star import load_table  # noqa: E402
from imdb_mapreduce_spark.streaming.jobs import (  # noqa: E402
    multires_fold_version,
    multires_merge_batch,
)
from imdb_mapreduce_spark.plans.events import multires_tiered_union  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("realtime-phase-profile")
    spark.range(1).count()

    for rep in range(reps):
        events = load_table(spark, "events", sf_dir).select(
            "ts", "event_type", "value"
        )
        t_total = time.monotonic()
        with tempfile.TemporaryDirectory() as d:
            src = os.path.join(d, "src")
            t0 = time.monotonic()
            events.repartitionByRange(4, "ts").write.parquet(src)
            parts = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
            t_stage = time.monotonic() - t0

            state_root = os.path.join(d, "state")
            state = None
            fold_times = []
            tier_times: list[dict[str, float]] = []
            for i, p in enumerate(parts[:-1]):
                tt: dict[str, float] = {}
                tier_times.append(tt)

                def timed_fold(spark, root, ver, batch, prev):
                    # replicate multires_fold_version but time each mat
                    cur = os.path.join(root, f"v{ver}")

                    def mat(name, df):
                        t = time.monotonic()
                        if name == "partials":
                            out = df.localCheckpoint(eager=True)
                        else:
                            path = os.path.join(cur, name)
                            df.write.mode("overwrite").parquet(path)
                            out = spark.read.parquet(path)
                        tt[name] = round(time.monotonic() - t, 3)
                        return out

                    tiers = multires_merge_batch(batch, prev, materialize=mat)
                    # count files per tier dir
                    for name in ("minute", "hour", "day"):
                        n = len(
                            glob.glob(os.path.join(cur, name, "part-*"))
                        )
                        tt[f"{name}_files"] = n
                    return tiers

                t0 = time.monotonic()
                state = timed_fold(
                    spark, state_root, i, spark.read.parquet(p), state
                )
                fold_times.append(round(time.monotonic() - t0, 3))

            t0 = time.monotonic()
            tail = spark.read.parquet(parts[-1])
            merged = multires_merge_batch(
                tail,
                state,
                materialize=lambda _n, df: df.localCheckpoint(eager=True),
            )
            out = multires_tiered_union(
                merged["minute"], merged["hour"], merged["day"]
            )
            out = out.localCheckpoint(eager=True)
            n = out.count()
            t_read = time.monotonic() - t0
        total = time.monotonic() - t_total
        print(
            f"rep{rep}: total={total:.2f}s stage={t_stage:.2f}s "
            f"folds={fold_times} read={t_read:.2f}s rows={n}"
        )
        for i, tt in enumerate(tier_times):
            print(f"  fold{i}: {tt}")


if __name__ == "__main__":
    main()
