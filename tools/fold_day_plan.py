"""Dump the formatted plan of the incremental fold's DAY-tier relation
(the relation `multires_fold_version` writes for the day tier on fold 2
of the realtime fixture) — plan evidence for the r15 coarse-tier change.

Usage: python tools/fold_day_plan.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import glob
import io
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from imdb_mapreduce_spark.session import get_spark  # noqa: E402
from imdb_mapreduce_spark.sources.star import load_table  # noqa: E402
from imdb_mapreduce_spark.streaming.jobs import (  # noqa: E402
    multires_fold_version,
    multires_merge_batch,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("fold-day-plan")
    events = load_table(spark, "events", sf_dir).select(
        "ts", "event_type", "value"
    )
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        events.repartitionByRange(4, "ts").write.parquet(src)
        parts = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
        state_root = os.path.join(d, "state")
        state = multires_fold_version(
            spark, state_root, 0, spark.read.parquet(parts[0]), None
        )
        # fold 1, but intercept the day tier's relation pre-write
        captured = io.StringIO()
        cur = os.path.join(state_root, "v1")

        def mat(name, df):
            if name == "partials":
                return df.localCheckpoint(eager=True)
            if name == "day":
                with contextlib.redirect_stdout(captured):
                    df.explain("formatted")
            path = os.path.join(cur, name)
            df.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)

        multires_merge_batch(
            spark.read.parquet(parts[1]), state, materialize=mat
        )
        print(captured.getvalue())


if __name__ == "__main__":
    main()
