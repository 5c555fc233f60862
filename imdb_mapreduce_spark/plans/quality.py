"""Data-quality expectation checks over the star schema — the constraint
report a pipeline runs BEFORE promoting a batch (the Deequ/Great-
Expectations shape, engine-side).

One row per declared check: name, violation count, table row count, and a
boolean verdict. The execution shape is what matters at 100 TB: every
same-table check folds into ONE conditional aggregation (a single scan
produces all of that table's violation counters via ``sum(case when)``,
partial-aggregated map-side), and the referential-integrity check is the
only join. No check adds a second pass over a table it shares with
another check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imdb_mapreduce_spark.plans.registry import register
from imdb_mapreduce_spark.sources.star import load_table

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
TS_LO, TS_HI = "2024-01-01", "2024-02-01"
QTY_LO, QTY_HI = 1, 50
DISC_LO, DISC_HI = 0.0, 0.1


@register(
    "dq_expectations",
    oracle=f"""
    WITH ev AS (SELECT
        CAST(SUM(CASE WHEN event_type NOT IN
              ('view','click','purchase','signup','error') THEN 1 ELSE 0 END)
          AS BIGINT) AS v_type,
        CAST(SUM(CASE WHEN ts < TIMESTAMP '{TS_LO}'
              OR ts >= TIMESTAMP '{TS_HI}' THEN 1 ELSE 0 END) AS BIGINT) AS v_ts,
        CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_val,
        CAST(COUNT(*) AS BIGINT) AS n FROM events),
    cust AS (SELECT
        CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_bal,
        CAST(COUNT(*) AS BIGINT) AS n FROM customer),
    ord AS (SELECT
        CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_dup,
        CAST(COUNT(*) AS BIGINT) AS n FROM orders),
    fk AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_fk
           FROM orders o WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
    li AS (SELECT
        CAST(SUM(CASE WHEN l_quantity < {QTY_LO} OR l_quantity > {QTY_HI}
              THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        CAST(SUM(CASE WHEN l_discount < {DISC_LO} OR l_discount > {DISC_HI}
              THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
        CAST(COUNT(*) AS BIGINT) AS n FROM lineitem)
    SELECT 'events_type_domain' AS check_name, v_type AS n_violations,
           n AS n_rows, v_type = 0 AS passed FROM ev
    UNION ALL SELECT 'events_ts_window', v_ts, n, v_ts = 0 FROM ev
    UNION ALL SELECT 'events_value_nonneg', v_val, n, v_val = 0 FROM ev
    UNION ALL SELECT 'customer_acctbal_nonneg', v_bal, n, v_bal = 0 FROM cust
    UNION ALL SELECT 'orders_orderkey_unique', v_dup, n, v_dup = 0 FROM ord
    UNION ALL SELECT 'orders_custkey_fk', v_fk, (SELECT n FROM ord),
                     v_fk = 0 FROM fk
    UNION ALL SELECT 'lineitem_quantity_range', v_qty, n, v_qty = 0 FROM li
    UNION ALL SELECT 'lineitem_discount_range', v_disc, n, v_disc = 0 FROM li
    """,
    tags=("quality", "north-star", "constraints"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint sweep: domain, range, window, non-negativity, key
    uniqueness, and referential integrity — one conditional-aggregation
    scan per table plus one anti-join, assembled into a verdict report."""
    b = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731

    ev = load_table(spark, "events", sf_dir).agg(
        b(~F.col("event_type").isin(*EVENT_TYPES)).alias("v_type"),
        b(
            (F.col("ts") < F.lit(TS_LO).cast("timestamp"))
            | (F.col("ts") >= F.lit(TS_HI).cast("timestamp"))
        ).alias("v_ts"),
        b(F.col("value") < 0).alias("v_val"),
        F.count("*").alias("n"),
    )
    ev_rows = ev.select(
        F.expr(
            "stack(3, 'events_type_domain', v_type, 'events_ts_window', v_ts,"
            " 'events_value_nonneg', v_val) AS (check_name, n_violations)"
        ),
        F.col("n").alias("n_rows"),
    )

    cust_rows = (
        load_table(spark, "customer", sf_dir)
        .agg(b(F.col("c_acctbal") < 0).alias("v_bal"), F.count("*").alias("n"))
        .select(
            F.lit("customer_acctbal_nonneg").alias("check_name"),
            F.col("v_bal").alias("n_violations"),
            F.col("n").alias("n_rows"),
        )
    )

    orders = load_table(spark, "orders", sf_dir)
    ord_agg = orders.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).cast("bigint").alias("v_dup"),
        F.count("*").alias("n"),
    )
    ord_rows = ord_agg.select(
        F.lit("orders_orderkey_unique").alias("check_name"),
        F.col("v_dup").alias("n_violations"),
        F.col("n").alias("n_rows"),
    )
    fk_rows = (
        orders.join(
            load_table(spark, "customer", sf_dir).select(
                F.col("c_custkey").alias("o_custkey")
            ),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count("*").cast("bigint").alias("v_fk"))
        .crossJoin(ord_agg.select("n"))  # 1×1: attach the table row count
        .select(
            F.lit("orders_custkey_fk").alias("check_name"),
            F.col("v_fk").alias("n_violations"),
            F.col("n").alias("n_rows"),
        )
    )

    li_rows = (
        load_table(spark, "lineitem", sf_dir)
        .agg(
            b((F.col("l_quantity") < QTY_LO) | (F.col("l_quantity") > QTY_HI)).alias(
                "v_qty"
            ),
            b((F.col("l_discount") < DISC_LO) | (F.col("l_discount") > DISC_HI)).alias(
                "v_disc"
            ),
            F.count("*").alias("n"),
        )
        .select(
            F.expr(
                "stack(2, 'lineitem_quantity_range', v_qty,"
                " 'lineitem_discount_range', v_disc) AS (check_name, n_violations)"
            ),
            F.col("n").alias("n_rows"),
        )
    )

    report = ev_rows.unionByName(cust_rows).unionByName(ord_rows).unionByName(
        fk_rows
    ).unionByName(li_rows)
    return report.withColumn("passed", F.col("n_violations") == 0)
