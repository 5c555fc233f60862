"""Long-drain file-count probe for the r16 auto-compaction policy
(VERDICT r15 item 3, guide §6): drain N tiny micro-batches through
``incremental_multires_drain`` twice — compact_every=None (r15 behavior)
vs the default cadence — and report per-version parquet file counts, to
prove the policy bounds the newest version's file debt on a long lineage
while leaving content identical (snapshot compare).

Usage: python tools/compaction_drain_probe.py [n_batches]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 18


def tier_files(state_root: str, v: int, tier: str) -> int:
    return len(
        glob.glob(os.path.join(state_root, f"v{v}", tier, "*.parquet"))
    )


def main() -> None:
    import pandas as pd

    from imdb_mapreduce_spark.session import get_spark
    from imdb_mapreduce_spark.streaming.jobs import (
        incremental_multires_drain,
    )
    from pyspark.sql.types import _parse_datatype_string

    spark = get_spark("compaction_drain_probe")
    st = _parse_datatype_string("ts timestamp, event_type string, value double")
    t0 = pd.Timestamp("2026-03-01 00:00:00")

    def run(compact_every):
        with tempfile.TemporaryDirectory() as d:
            src = os.path.join(d, "src")
            os.makedirs(src)
            for i in range(N):
                pdf = pd.DataFrame(
                    [
                        (
                            t0 + pd.Timedelta(minutes=i * 7 + j),
                            "click" if j % 2 else "view",
                            float(i + j),
                        )
                        for j in range(3)
                    ],
                    columns=["ts", "event_type", "value"],
                )
                p = os.path.join(src, f"b{i:03d}.parquet")
                pdf.to_parquet(
                    p, coerce_timestamps="us", allow_truncated_timestamps=True
                )
                os.utime(p, (1_000_000 + i, 1_000_000 + i))
            state_root = os.path.join(d, "state")
            state = incremental_multires_drain(
                spark, src, st, state_root, os.path.join(d, "ckpt"),
                compact_every=compact_every,
            )
            counts = {
                v: {
                    t: tier_files(state_root, v, t)
                    for t in ("minute", "hour", "day")
                }
                for v in range(N)
            }
            snap = {
                t: sorted(
                    (str(r["bucket"]), r["event_type"], r["n_events"],
                     float(r["s"]))
                    for r in state[t].collect()
                )
                for t in ("minute", "hour", "day")
            }
            return counts, snap

    base_counts, base_snap = run(None)
    auto_counts, auto_snap = run(8)
    assert base_snap == auto_snap, "auto-compaction changed state content!"
    print(json.dumps({
        "n_batches": N,
        "content_identical": True,
        "file_counts_no_compaction": {
            str(v): base_counts[v] for v in sorted(base_counts)
        },
        "file_counts_compact_every_8": {
            str(v): auto_counts[v] for v in sorted(auto_counts)
        },
    }))


if __name__ == "__main__":
    main()
