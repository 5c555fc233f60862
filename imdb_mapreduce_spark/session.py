"""SparkSession factory with a scale-aware default config.

The reference hand-rolls its cluster: a static node roster
(``/root/reference/src/master/constants.hrl:17-23``), per-line message
scatter, manual snapshot replication. All of that is Spark infrastructure
(SURVEY.md §2.11), so the only thing this module owns is *configuration* —
chosen for correctness at local[32] test scale while keeping every knob one a
1000-executor / 100 TB deployment would also want:

- AQE on (runtime join-strategy switch, skew-join splitting, partition
  coalescing) — replaces the reference's hand-placed "small table stays on
  the master" choice (``dataInit.erl:79-95``) with a cost-based one;
- explicit shuffle partition count, overridable by env, so the same code
  scales from 32 local threads to thousands of cores;
- Arrow enabled for the (few, clearly-marked) Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DEFAULT_SHUFFLE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(DEFAULT_CPUS, 32)))
)


def get_spark(
    app_name: str = "imdb_mapreduce_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's default tuning.

    On a real cluster, ``master`` comes from spark-submit and this function
    only layers SQL conf on top; locally it defaults to ``local[N]``.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate infers `size(arr) > 0 AND arr IS NOT
        # NULL` below every explode and pushes it past the projection
        # that computes the array — so an EXPENSIVE generator input (the
        # word-shingle build: split + transform + array_join + distinct,
        # and every other derived-array explode here) is evaluated TWICE
        # per input row, once in the inferred filter over raw text and
        # once in the projection. The filter is redundant for results —
        # explode itself drops empty/NULL arrays — so excluding the rule
        # changes no output anywhere, at any scale; it only removes the
        # double evaluation. Measured r15 at sf0.1: exploded_shingles
        # 2.16 → 0.66 s (noop-sink min-of-4), thresholded Jaccard pair
        # join 2.6 → 1.2 s; plan diff: the interpreted
        # `Filter size(array_distinct(transform(...))) > 0` over raw
        # text disappears (plans/r15/exploded_shingles_*). Not a
        # local-mode artifact: the rule doubles generator-input compute
        # on any cluster; the early-pruning upside it theoretically buys
        # only exists when exploded arrays are frequently empty, which
        # the engine's derived arrays never are (>=1 element by
        # construction).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # NOT enabled: spark.sql.optimizer.runtime.bloomFilter /
        # runtimeFilter.semiJoinReduction. Tried in r05 — the pair caused
        # intermittent first-job hangs on this local[32] build; on a real
        # cluster deployment they are the right knobs for star joins whose
        # dim side outgrows the broadcast budget (runtime semi-join
        # pushdown), so turn them on there and smoke-test first.
        # Files at 100 TB: bigger read partitions to bound task count.
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts is nanosecond parquet; TimestampType (µs) refuses it.
        # Owned here so engine-built sessions never need the readers'
        # vanilla-session fallback (sources/star.py::ensure_nanos_as_long).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
