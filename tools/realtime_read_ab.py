"""Interleaved A/B of the realtime READ LEG (r15 opt round, session 3).

Arm A (current): read-time materializer localCheckpoints each relation
(partials, minute, hour, day) — partials wall + 3-wide tier wall +
final-union wall.
Arm B (candidate): pin ONLY the batch partials; tiers stay LAZY (identity
materializer, coarse tiers derived from prev ∪ pinned partials — the
r15-opt-2 parallel derivation) so the final readout union is ONE action
computing all three independent tier branches.

Outputs are identical by the associative merge laws (the same argument
and pytest as `_coarse_tiers`' materialized path); this measures walls.

Usage: python tools/realtime_read_ab.py [sf_dir] [reps]
"""
from __future__ import annotations

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
    fold_slices_pipelined,
    kmv_batch_partials,
    multires_batch_partials,
    multires_kmv_merge_batch,
    multires_merge_batch,
    multires_qtl_merge_batch,
    qtl_batch_partials,
)
from imdb_mapreduce_spark.plans.events import (  # noqa: E402
    kmv_bucket_stats,
    multires_tiered_union,
    qtl_bucket_stats,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 6

FAMS = {
    "rollup": (
        ("ts", "event_type", "value"),
        multires_batch_partials,
        multires_merge_batch,
        lambda m: multires_tiered_union(m["minute"], m["hour"], m["day"]),
    ),
    "distinct": (
        ("ts", "user_id"),
        kmv_batch_partials,
        multires_kmv_merge_batch,
        lambda m: kmv_bucket_stats(m["minute"], "minute")
        .unionByName(kmv_bucket_stats(m["hour"], "hour"))
        .unionByName(kmv_bucket_stats(m["day"], "day")),
    ),
    "quantile": (
        ("ts", "event_id", "user_id", "value"),
        qtl_batch_partials,
        multires_qtl_merge_batch,
        lambda m: qtl_bucket_stats(m["minute"], "minute")
        .unionByName(qtl_bucket_stats(m["hour"], "hour"))
        .unionByName(qtl_bucket_stats(m["day"], "day")),
    ),
}


def main() -> None:
    spark = get_spark("realtime-read-ab")
    spark.range(1).count()
    import glob as _glob

    for fam, (cols, builder, merge_fn, readout) in FAMS.items():
        events = load_table(spark, "events", SF_DIR).select(*cols)
        with tempfile.TemporaryDirectory() as d:
            src = os.path.join(d, "src")
            events.repartitionByRange(4, "ts").write.parquet(src)
            parts = sorted(_glob.glob(os.path.join(src, "part-*.parquet")))
            state = fold_slices_pipelined(
                spark, os.path.join(d, "state"), parts[:-1], builder,
                merge_fn=merge_fn if fam != "rollup" else None,
            )
            tail_path = parts[-1]

            def read_old() -> int:
                tail = spark.read.parquet(tail_path)
                merged = merge_fn(
                    tail, state,
                    materialize=lambda _n, df: df.localCheckpoint(eager=True),
                )
                return readout(merged).localCheckpoint(eager=True).count()

            def read_new() -> int:
                tail = spark.read.parquet(tail_path)
                mb = builder(tail).localCheckpoint(eager=True)
                merged = merge_fn(
                    tail, state,
                    materialize=lambda _n, df: df, partials=mb,
                )
                return readout(merged).localCheckpoint(eager=True).count()

            res: dict[str, list[float]] = {"old": [], "new": []}
            rows: dict[str, int] = {}
            # warm both arms once (untimed)
            read_old(), read_new()
            for _ in range(REPS):
                for arm, fn in (("old", read_old), ("new", read_new)):
                    t = time.monotonic()
                    rows[arm] = fn()
                    res[arm].append(round(time.monotonic() - t, 3))
            assert rows["old"] == rows["new"], (fam, rows)
            print(
                f"{fam:9s} rows={rows['old']:4d} "
                f"old min={min(res['old']):.3f} med={sorted(res['old'])[REPS//2]:.3f} {res['old']} "
                f"new min={min(res['new']):.3f} med={sorted(res['new'])[REPS//2]:.3f} {res['new']}"
            )


if __name__ == "__main__":
    main()
