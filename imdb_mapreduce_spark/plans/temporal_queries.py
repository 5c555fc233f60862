"""AS-OF and range-join query plans (the custom temporal operators,
operators/temporal.py) — both fully oracle-backed: DuckDB has native
ASOF JOIN and range joins, so the composed-DataFrame implementations are
value-checked against a real reference implementation of the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imdb_mapreduce_spark.operators.temporal import asof_join, band_join
from imdb_mapreduce_spark.plans.registry import register
from imdb_mapreduce_spark.sources.star import load_table


@register(
    "asof_last_purchase",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           p.purchase_event_id AS purchase_event_id_asof,
           p.purchase_value AS purchase_value_asof
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT event_id AS purchase_event_id,
                           value AS purchase_value, user_id, ts
                    FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    tags=("asof", "temporal", "custom-operator"),
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each error event picks up the most recent prior (or
    simultaneous) purchase of the same user — the canonical 'state as of
    event time' enrichment. Checked against DuckDB's NATIVE ASOF JOIN, so
    the union+window implementation is semantics-verified, not just
    self-consistent."""
    e = load_table(spark, "events", sf_dir)
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
        "user_id",
        "ts",
    )
    return asof_join(
        errors,
        purchases,
        key="user_id",
        ts="ts",
        payload=["purchase_event_id", "purchase_value"],
    )


@register(
    "quantity_band_stats",
    oracle="""
    SELECT band, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM lineitem
    JOIN (VALUES ('small', 0.0, 15.0), ('medium', 15.0, 35.0), ('large', 35.0, 100.0))
         AS bands(band, lo, hi)
      ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
    tags=("range-join", "temporal", "custom-operator"),
)
def quantity_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: facts against an interval table on a non-equi
    predicate — broadcast nested-loop over 3 bands = effectively map-side.
    The interval-table pattern covers histogramming, SLA tiers, time
    bucketing against irregular calendars."""
    l = load_table(spark, "lineitem", sf_dir)
    bands = spark.createDataFrame(
        [("small", 0.0, 15.0), ("medium", 15.0, 35.0), ("large", 35.0, 100.0)],
        ["band", "lo", "hi"],
    )
    joined = band_join(l, bands, "l_quantity")
    return joined.groupBy("band").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_price"),
    )


_SCD2_ORACLE = """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type),
    versioned AS (
      SELECT user_id, event_type,
             epoch_us(ts) AS valid_from_us,
             epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)) AS valid_to_us,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT) AS version
      FROM changes)
    SELECT user_id, event_type, valid_from_us,
           COALESCE(valid_to_us, CAST(-1 AS BIGINT)) AS valid_to_us,
           version,
           valid_to_us IS NULL AS is_current
    FROM versioned
"""


@register(
    "user_state_scd2",
    oracle=_SCD2_ORACLE,
    tags=("temporal", "scd2", "window", "north-star"),
)
def user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build: compress each user's event-type stream
    into validity intervals — the lakehouse dimension-history op (state,
    valid_from, valid_to, version, is_current) built from an append-only
    change log in two windows over ONE (user_id)-partitioned exchange:
    LAG to keep only state CHANGES, LEAD/ROW_NUMBER on the survivors to
    close each interval and stamp versions. Open intervals emit
    valid_to_us = −1 with ``is_current`` true (epoch-µs BIGINTs, exact
    cross-engine; a NULL sentinel would be representation-ambiguous in
    the value hash).

    100 TB posture: both windows key on user_id — one shuffle total,
    state-change compression happens BEFORE the second window touches the
    (much smaller) change set; no global ordering anywhere."""
    from pyspark.sql.window import Window

    from imdb_mapreduce_spark.functions.columns import epoch_us

    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    # event_id tie-break keeps versions/intervals deterministic when a
    # user has two state-changing events at the identical timestamp —
    # without it LEAD/ROW_NUMBER order is engine-defined and the parity
    # hash can flake (both windows share the one user_id exchange).
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select(
            "user_id",
            "event_type",
            epoch_us("ts").alias("valid_from_us"),
            epoch_us(F.lead("ts").over(w2)).alias("vt"),
            F.row_number().over(w2).cast("long").alias("version"),
        )
        .select(
            "user_id",
            "event_type",
            "valid_from_us",
            F.coalesce("vt", F.lit(-1).cast("bigint")).alias("valid_to_us"),
            "version",
            F.col("vt").isNull().alias("is_current"),
        )
    )


# Point-in-time probe for the AS-OF read: mid-range of the fixtures'
# event-time domain (2024-01-15 00:00:00 UTC as epoch-µs). Any T works;
# a constant keeps the query/oracle trivially aligned.
ASOF_T_US = 1_705_276_800_000_000


@register(
    "user_state_asof",
    oracle=f"""
    SELECT user_id, event_type, version
    FROM ({_SCD2_ORACLE}) s
    WHERE valid_from_us <= {ASOF_T_US}
      AND (valid_to_us = -1 OR valid_to_us > {ASOF_T_US})
    """,
    tags=("temporal", "scd2", "asof", "north-star"),
)
def user_state_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ side of the SCD2 story: every user's state AS OF a point
    in time — the time-travel probe a feature store / reproducible
    training snapshot runs against the validity intervals
    ``user_state_scd2`` writes. Implemented as a filter OVER the interval
    build (the plan literally composes the registered SCD2 query), so the
    two queries cannot drift; exactly one row per user active at T (an
    interval set partitions each user's timeline).

    100 TB posture: in production the intervals are already materialized
    (the SCD2 table), so this is a scan + filter with the predicate
    pushed to parquet; composed inline here it adds one filter to the
    SCD2 plan's single exchange."""
    scd = user_state_scd2(spark, sf_dir)
    return scd.filter(
        (F.col("valid_from_us") <= ASOF_T_US)
        & ((F.col("valid_to_us") == -1) | (F.col("valid_to_us") > ASOF_T_US))
    ).select("user_id", "event_type", "version")
