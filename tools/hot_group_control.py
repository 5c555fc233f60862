"""The bounded-call control for the Arrow-bridge wall (SCALING.md r11).

One grouping key owns EVERY row; the group flows through batch
``applyInPandas`` — the same ``BasePythonRunner`` JVM→Python channel and
staging ``DirectByteBufferOutputStream`` as the stateful operators, but
with ONE BOUNDED Arrow batch per channel call instead of
``applyInPandasWithState``'s one WHOLE GROUP per call. If the wall lived
in the channel/Arrow/Python, this sweep would stall at the same group
sizes that killed the stateful drain (>92 min at 60M rows/group, r10);
measured instead: flat ~828 ns/row from 20M to 100M rows/group
(49.7 s at 60M, 82.8 s at 100M — SCALING.md r11 has the full table).

Usage: python tools/hot_group_control.py [max_rows] [master]
Row shape approximates the events stream (string key + 2 longs + a
double). Prints one line per point; a point that stalls is the signal —
kill it and record the timeout, as the r10 stateful runs did.

The SCALING.md r11 table was measured at ``local[32]``; the default here
is ``local[*]`` so the tool runs honestly on any host (ADVICE r11), and
the effective parallelism is printed with every measurement line so a
reproduction on a smaller box is never silently compared to the
32-thread table.
"""

import os
import sys
import time

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def one_group(spark, n: int) -> float:
    df = spark.range(n).select(
        F.lit("hot").alias("g"),
        F.col("id").alias("user_id"),
        (F.col("id") % 1000).alias("k"),
        (F.col("id") * 0.5).alias("value"),
    )

    def fn(pdf):
        return pd.DataFrame(
            {
                "g": [pdf["g"].iloc[0]],
                "n": [len(pdf)],
                "s": [float(pdf["value"].sum())],
            }
        )

    out = df.groupBy("g").applyInPandas(fn, "g string, n long, s double")
    t0 = time.time()
    rows = out.collect()
    dt = time.time() - t0
    assert rows[0]["n"] == n
    return dt


def main() -> None:
    from imdb_mapreduce_spark.session import get_spark

    max_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    master = sys.argv[2] if len(sys.argv) > 2 else "local[*]"
    spark = get_spark("hot_group_control", master=master)
    cores = spark.sparkContext.defaultParallelism
    for n in (5, 10, 20, 40, 60, 100):
        rows = n * 1_000_000
        if rows > max_rows:
            break
        dt = one_group(spark, rows)
        print(
            f"rows/group={rows:>11,}  {dt:7.1f} s  "
            f"({dt / rows * 1e9:.1f} ns/row)  "
            f"[master={master} parallelism={cores}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
