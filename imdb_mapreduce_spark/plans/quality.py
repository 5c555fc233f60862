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


# Column profile targets: (column, is_numeric). Numeric min/max are exact
# (order-independent), so they cross-check as DOUBLE; string/timestamp
# min/max are omitted rather than fighting engine-specific cast formats.
PROFILE_COLS = (
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
)


def _profile_oracle() -> str:
    branches = []
    for col, numeric in PROFILE_COLS:
        mn = f"CAST(MIN({col}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(MAX({col}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        branches.append(
            f"SELECT '{col}' AS col_name,"
            f" CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,"
            f" CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num"
            f" FROM orders"
        )
    return "\nUNION ALL ".join(branches)


@register(
    "table_profile_orders",
    oracle=_profile_oracle(),
    tags=("quality", "profiling", "north-star"),
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of ``orders`` — null counts, distinct
    cardinalities, numeric min/max: the schema-drift / batch-health report
    a pipeline emits before promoting new data (the pandas-profiling /
    Deequ ``ColumnProfilerRunner`` shape, engine-side).

    Execution shape: ONE scan. All per-column counters fold into a single
    aggregation; the COUNT(DISTINCT)s share the scan through Catalyst's
    Expand rewrite (one exchange per distinct column set, partial-agged
    map-side — not one job per column, which is what a naive profiler
    loop would issue at 100 TB)."""
    o = load_table(spark, "orders", sf_dir)
    aggs = []
    for col, numeric in PROFILE_COLS:
        aggs.append((F.count("*") - F.count(col)).cast("long").alias(f"nn_{col}"))
        aggs.append(F.count_distinct(F.col(col)).cast("long").alias(f"nd_{col}"))
        if numeric:
            aggs.append(F.min(col).cast("double").alias(f"mn_{col}"))
            aggs.append(F.max(col).cast("double").alias(f"mx_{col}"))
    wide = o.agg(*aggs)
    stack_args = []
    for col, numeric in PROFILE_COLS:
        mn = f"mn_{col}" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"mx_{col}" if numeric else "CAST(NULL AS DOUBLE)"
        stack_args.append(f"'{col}', nn_{col}, nd_{col}, {mn}, {mx}")
    return wide.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {', '.join(stack_args)})"
            " AS (col_name, n_nulls, n_distinct, min_num, max_num)"
        )
    )


QUALITY_DECILES_KEPT = 8  # keep deciles 8-10 (top 30% by type-token ratio)


@register(
    "quality_decile_filter",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr
      FROM documents),
    deciled AS (
      SELECT doc_id, source, ttr,
             CAST(NTILE(10) OVER (PARTITION BY source
                                  ORDER BY ttr, doc_id) AS INT) AS decile
      FROM scored)
    SELECT doc_id, source, ttr, decile
    FROM deciled WHERE decile >= {QUALITY_DECILES_KEPT}
    """,
    tags=("quality", "text", "north-star", "window"),
)
def quality_decile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-bin quality filtering: score every doc (type-token ratio),
    NTILE(10) within each source, keep the top deciles — the standard
    'keep the best X% per domain' curation gate (quality-classifier
    thresholding by quantile rather than absolute score, so each source
    retains the same fraction regardless of its score distribution).

    One shuffle (hash by source for the window), map-side projection for
    the score. Skew note: NTILE needs its partition sorted, so a single
    giant source would bottleneck one task at 100 TB — pre-aggregate an
    approximate CDF per source (percentile_approx) and cut on that
    instead when a source exceeds executor-sort capacity; the exact
    NTILE here is the reproducible small/medium-domain path. Ties sort
    by doc_id so both engines bin identically."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "source",
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double")
        ).alias("ttr"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("ttr", "doc_id")
    return (
        scored.withColumn("decile", F.ntile(10).over(w).cast("int"))
        .filter(F.col("decile") >= QUALITY_DECILES_KEPT)
    )


KMV_K = 64
KMV_SALTS = 64  # sub-partitions for the two-level k-smallest
KMV_SPACE = 1 << 60  # md5 15-hex-char prefix → uniform on [0, 2^60)


@register(
    "kmv_distinct_users",
    oracle=f"""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM du),
    rk AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h),
    kmv AS (
      SELECT event_type, MAX(h) AS kth_hash, CAST(COUNT(*) AS BIGINT) AS m
      FROM rk WHERE rn <= {KMV_K} GROUP BY event_type),
    exact AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type)
    SELECT e.event_type, e.n_exact, k.kth_hash,
           CASE WHEN k.m < {KMV_K} THEN CAST(k.m AS DOUBLE)
                ELSE ({KMV_K} - 1) * CAST({KMV_SPACE} AS DOUBLE)
                     / CAST(k.kth_hash AS DOUBLE) END AS est_distinct
    FROM exact e JOIN kmv k ON k.event_type = e.event_type
    """,
    tags=("quality", "sketch", "north-star"),
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch per event type, next to the
    exact answer it approximates. KMV is the cardinality sketch that stays
    DETERMINISTIC and portable: hash every key with md5, keep the K
    smallest hash values per group, and estimate distinct ≈ (K−1)·M/h(K)
    (hashes uniform on [0, M)). Unlike BUILT-IN HLL (whose register
    layout is engine-private; ``hll_distinct_users`` rebuilds the
    registers portably), every step here — hash, k-smallest, one division —
    reproduces bit-for-bit in any SQL engine, so the sketch itself is
    driver-oracle-verified; accuracy (~1/√K ≈ 12% worst-case, 3% observed)
    is pytest-asserted against the exact column.

    Scale posture: the K-smallest set is MERGEABLE (union then re-take K
    smallest — pytest-proven), and the query USES that property: the
    salted two-level top-k ranks within (group, h mod {KMV_SALTS})
    sub-partitions first, so no task ever sorts a full group's key set,
    then re-ranks the surviving salts×K rows per group. Identical result
    to a single global window (the oracle's form), scale-safe shape.
    Groups under K keys fall back to the exact count (m < K)."""
    from pyspark.sql.window import Window

    e = load_table(spark, "events", sf_dir)
    du = e.select("event_type", "user_id").distinct()
    h = du.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    # two-level k-smallest (salted top-k): pass 1 ranks inside (type,
    # salt) sub-partitions — no task ever sorts a full group's key set —
    # and bounds pass 2's input to salts×K rows per type. The union of
    # per-salt K-smallest sets contains the global K smallest, so the
    # result is identical to a single global window (the oracle's form).
    salted = h.withColumn("salt", F.pmod("h", F.lit(KMV_SALTS)))
    w1 = Window.partitionBy("event_type", "salt").orderBy("h")
    pre = salted.withColumn("rn1", F.row_number().over(w1)).filter(
        F.col("rn1") <= KMV_K
    )
    w2 = Window.partitionBy("event_type").orderBy("h")
    kmv = (
        pre.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("kth_hash"), F.count("*").cast("long").alias("m"))
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    est = F.when(F.col("m") < KMV_K, F.col("m").cast("double")).otherwise(
        F.lit(float(KMV_K - 1)) * F.lit(float(KMV_SPACE)) / F.col("kth_hash").cast("double")
    )
    return exact.join(kmv, "event_type").select(
        "event_type", "n_exact", "kth_hash", est.alias("est_distinct")
    )


@register(
    "props_redaction_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(length(props) - length(regexp_replace(props, '[0-9]', '', 'g')))
             AS BIGINT) AS n_digits_masked,
           CAST(COUNT(DISTINCT regexp_replace(props, '[0-9]+', '#', 'g')) AS BIGINT)
             AS n_templates
    FROM events
    GROUP BY event_type
    """,
    tags=("quality", "redaction", "north-star"),
)
def props_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex redaction audit over the semi-structured ``props`` payload:
    how many numeric characters each event type would mask, and how many
    distinct post-redaction templates remain — the PII-scrubbing
    accounting step of a training-data pipeline (digit runs stand in for
    the phone/SSN/account patterns a production rule set would carry; the
    mechanics — masked-char accounting, template cardinality after
    ``regexp_replace`` — are identical).

    All built-in regex ops, map-side, one aggregation shuffle; the
    distinct-template count rides the same Expand rewrite as any
    COUNT(DISTINCT). A real rule set is a chain of regexp_replace calls —
    still one projection, still zero Python."""
    e = load_table(spark, "events", sf_dir)
    masked = F.regexp_replace("props", "[0-9]+", "#")
    n_digits = F.length("props") - F.length(F.regexp_replace("props", "[0-9]", ""))
    return e.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(n_digits).cast("long").alias("n_digits_masked"),
        F.count_distinct(masked).cast("long").alias("n_templates"),
    )


# Count-min sketch: d independent md5-derived hash rows × w counters.
CM_DEPTH = 4
CM_WIDTH = 512
CM_TOP_N = 20


def _cm_bucket_spark(j: int, key) -> "F.Column":
    """Row-j counter index of ``key``: 28-bit md5 prefix of ``j:key`` mod
    width — the repo's portable-hash idiom (identical hex parse both
    engines), one independent hash per sketch row via the ``j:`` prefix."""
    s = F.concat(F.lit(f"{j}:"), key.cast("string"))
    return F.pmod(
        F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("bigint"),
        F.lit(CM_WIDTH),
    )


def _cm_bucket_sql(j: str, key: str) -> str:
    return (
        f"(('0x' || substring(md5(CAST({j} AS VARCHAR) || ':' ||"
        f" CAST({key} AS VARCHAR)), 1, 7))::BIGINT % {CM_WIDTH})"
    )


@register(
    "cm_sketch_heavy_hitters",
    oracle=f"""
    WITH rows_j AS (SELECT UNNEST(generate_series(0, {CM_DEPTH - 1})) AS j),
    cells AS (
      SELECT j, {_cm_bucket_sql("j", "user_id")} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events CROSS JOIN rows_j
      GROUP BY 1, 2),
    exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY user_id),
    est AS (
      SELECT e.user_id, e.exact_cnt, MIN(c.cnt) AS cm_est
      FROM exact e
      CROSS JOIN rows_j
      JOIN cells c ON c.j = rows_j.j
                  AND c.bucket = {_cm_bucket_sql("rows_j.j", "e.user_id")}
      GROUP BY e.user_id, e.exact_cnt)
    SELECT user_id, exact_cnt, cm_est, cm_est - exact_cnt AS overestimate
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, user_id) AS rn
      FROM est) t
    WHERE rn <= {CM_TOP_N}
    """,
    tags=("quality", "sketch", "north-star"),
)
def cm_sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch next to the exact counts it approximates: estimate
    per-user event counts from a {CM_DEPTH}×{CM_WIDTH} counter matrix and
    report the top heavy hitters with their guaranteed-one-sided error
    (``overestimate`` ≥ 0 by construction — collisions only ever ADD).

    Like the KMV sketch above, the hashes are md5-derived so the sketch is
    DETERMINISTIC and the whole estimate reproduces bit-for-bit in the
    DuckDB oracle — unlike engine-private approx_count structures.

    Scale posture: the sketch is d·w = {CM_DEPTH * CM_WIDTH} integer cells
    REGARDLESS of corpus size — one map-side-combining shuffle keyed on
    (row, bucket) builds it, and two sketches merge by cell-wise addition
    (pytest-proven), the property that makes it a streaming/partitioned
    aggregate. The estimate join keys candidates to d cells each; the
    top-N ranking is the usual two-level window shape."""
    e = load_table(spark, "events", sf_dir)
    cells = (
        e.select(
            F.posexplode(
                F.array(
                    *[_cm_bucket_spark(j, F.col("user_id")) for j in range(CM_DEPTH)]
                )
            ).alias("j", "bucket")
        )
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    exact = e.groupBy("user_id").agg(F.count("*").cast("long").alias("exact_cnt"))
    probes = exact.select(
        "user_id",
        "exact_cnt",
        F.posexplode(
            F.array(
                *[_cm_bucket_spark(j, F.col("user_id")) for j in range(CM_DEPTH)]
            )
        ).alias("j", "bucket"),
    )
    est = (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("cm_est"))
    )
    # global top-N via orderBy+limit → TakeOrdered (map-side partial top-N
    # per partition, driver merges N·partitions rows) — never a
    # single-partition window
    return (
        est.orderBy(F.col("exact_cnt").desc(), "user_id")
        .limit(CM_TOP_N)
        .select(
            "user_id",
            "exact_cnt",
            "cm_est",
            (F.col("cm_est") - F.col("exact_cnt")).alias("overestimate"),
        )
    )


# Bloom filter: m bits packed into 64-bit words, k md5-derived hashes.
BLOOM_BITS = 4096
BLOOM_WORDS = BLOOM_BITS // 32  # 32-bit payload per word: max shift 31, no sign-bit overflow in either engine
BLOOM_K = 3


def _bloom_pos_spark(j: int, key) -> "F.Column":
    s = F.concat(F.lit(f"b{j}:"), key.cast("string"))
    return F.pmod(
        F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("bigint"),
        F.lit(BLOOM_BITS),
    )


def _bloom_pos_sql(j: str, key: str) -> str:
    return (
        f"(('0x' || substring(md5('b' || CAST({j} AS VARCHAR) || ':' ||"
        f" CAST({key} AS VARCHAR)), 1, 7))::BIGINT % {BLOOM_BITS})"
    )


@register(
    "bloom_filter_prune",
    oracle=f"""
    WITH ks AS (SELECT UNNEST(generate_series(0, {BLOOM_K - 1})) AS j),
    members AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_orderpriority = '1-URGENT'),
    bloom AS (
      SELECT CAST(pos // 32 AS INT) AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
      FROM (SELECT {_bloom_pos_sql("ks.j", "m.k")} AS pos
            FROM members m CROSS JOIN ks) p
      GROUP BY 1),
    probe AS (
      SELECT c.c_custkey,
             MIN(CASE WHEN (COALESCE(b.bits, 0)
                            & (CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INT)))
                           <> 0
                      THEN 1 ELSE 0 END) AS candidate
      FROM (SELECT c_custkey, {_bloom_pos_sql("ks.j", "c_custkey")} AS pos
            FROM customer CROSS JOIN ks) p
      JOIN customer c ON c.c_custkey = p.c_custkey
      LEFT JOIN bloom b ON b.word = CAST(p.pos // 32 AS INT)
      GROUP BY c.c_custkey),
    truth AS (
      SELECT p.c_custkey, p.candidate,
             CASE WHEN m.k IS NULL THEN 0 ELSE 1 END AS is_member
      FROM probe p LEFT JOIN members m ON m.k = p.c_custkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(is_member) AS BIGINT) AS n_members,
           CAST(SUM(candidate) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN candidate = 1 AND is_member = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS false_pos,
           CAST(SUM(CASE WHEN candidate = 0 AND is_member = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS false_neg,
           CAST(SUM(CASE WHEN candidate = 1 AND is_member = 0 THEN 1 ELSE 0
                    END) AS DOUBLE)
             / CAST(SUM(CASE WHEN is_member = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             AS fp_rate
    FROM truth
    """,
    tags=("quality", "sketch", "join", "north-star"),
)
def bloom_filter_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, audited against the exact semi-join:
    build a {BLOOM_BITS}-bit filter (packed into {BLOOM_WORDS} words of 32 payload bits
    via ``bit_or``) over the urgent-order customer set, probe EVERY
    customer through its {BLOOM_K} md5-derived bit positions, and report
    the confusion counts. ``false_neg`` is 0 by construction — the
    guarantee that makes Bloom pruning sound as a pre-join filter — and
    ``fp_rate`` is the price paid (pytest bounds it near the
    (1−e^(−kn/m))^k theory value).

    This is the operator UNDER Spark's own runtime-filter/DPP machinery,
    surfaced as data: at 100 TB the filter ({BLOOM_WORDS} words, constant) broadcasts
    to prune a fact-table scan before the real join shuffles anything.
    The build is one map-side-combining ``bit_or`` shuffle of ≤{BLOOM_WORDS}
    rows; md5 hashes make the bit layout engine-portable, so even the
    packed words hash-match the oracle bit-for-bit."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    members = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    # shiftleft() the builtin only takes a literal bit count — go through
    # expr for a column-valued shift; 32-bit payloads keep the shift ≤ 31
    # (DuckDB raises on a 1<<63 BIGINT overflow, Spark silently wraps)
    shl = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 32) AS INT))")
    positions = members.select(
        F.explode(
            F.array(*[_bloom_pos_spark(j, F.col("k")) for j in range(BLOOM_K)])
        ).alias("pos")
    )
    bloom = (
        positions.select(
            (F.col("pos") / 32).cast("int").alias("word"),
            shl.alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )
    probe_pos = c.select(
        "c_custkey",
        F.explode(
            F.array(
                *[_bloom_pos_spark(j, F.col("c_custkey")) for j in range(BLOOM_K)]
            )
        ).alias("pos"),
    )
    probe = (
        probe_pos.join(
            F.broadcast(bloom),
            (F.col("pos") / 32).cast("int") == F.col("word"),
            "left",
        )
        .select(
            "c_custkey",
            F.when(
                F.coalesce(F.col("bits"), F.lit(0).cast("bigint")).bitwiseAND(shl)
                != 0,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("hit"),
        )
        .groupBy("c_custkey")
        .agg(F.min("hit").alias("candidate"))
    )
    truth = probe.join(
        members, probe["c_custkey"] == members["k"], "left"
    ).select(
        "candidate",
        F.when(F.col("k").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("is_member"),
    )
    fp = F.sum(
        F.when((F.col("candidate") == 1) & (F.col("is_member") == 0), 1).otherwise(0)
    )
    return truth.agg(
        F.count("*").cast("long").alias("n_probes"),
        F.sum("is_member").cast("long").alias("n_members"),
        F.sum("candidate").cast("long").alias("n_candidates"),
        fp.cast("long").alias("false_pos"),
        F.sum(
            F.when((F.col("candidate") == 0) & (F.col("is_member") == 1), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("false_neg"),
        (
            fp.cast("double")
            / F.sum(F.when(F.col("is_member") == 0, 1).otherwise(0)).cast("double")
        ).alias("fp_rate"),
    )


@register(
    "kmv_set_ops",
    oracle=f"""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM du),
    sk AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM h) t
      WHERE rn <= {KMV_K}),
    theta AS (
      SELECT event_type, MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS m
      FROM sk GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CASE WHEN ta.m < {KMV_K} THEN {KMV_SPACE} ELSE ta.kth END AS th_a,
             CASE WHEN tb.m < {KMV_K} THEN {KMV_SPACE} ELSE tb.kth END AS th_b
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b
        ON a.event_type < b.event_type
      JOIN theta ta ON ta.event_type = a.event_type
      JOIN theta tb ON tb.event_type = b.event_type),
    common AS (
      SELECT sa.event_type AS type_a, sb.event_type AS type_b, sa.h
      FROM sk sa JOIN sk sb ON sb.h = sa.h
                           AND sa.event_type < sb.event_type),
    inter_c AS (
      SELECT p.type_a, p.type_b, LEAST(p.th_a, p.th_b) AS theta,
             CAST(COUNT(c.h) AS BIGINT) AS c
      FROM pairs p
      LEFT JOIN common c ON c.type_a = p.type_a AND c.type_b = p.type_b
                        AND c.h < LEAST(p.th_a, p.th_b)
      GROUP BY 1, 2, 3),
    merged AS (
      SELECT p.type_a, p.type_b, s.h FROM pairs p
      JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
      GROUP BY 1, 2, 3),
    uni_est AS (
      SELECT type_a, type_b, MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS m
      FROM (
        SELECT type_a, type_b, h,
               ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
        FROM merged) t
      WHERE rn <= {KMV_K}
      GROUP BY 1, 2),
    exact_inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM du a JOIN du b ON b.user_id = a.user_id
                         AND a.event_type < b.event_type
      GROUP BY 1, 2),
    exact_n AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY 1)
    SELECT p.type_a, p.type_b,
           COALESCE(ei.n_inter, 0) AS n_inter_exact,
           CAST(ic.c AS DOUBLE) * {KMV_SPACE} / CAST(ic.theta AS DOUBLE)
             AS est_inter,
           na.n + nb.n - COALESCE(ei.n_inter, 0) AS n_union_exact,
           CASE WHEN ue.m < {KMV_K} THEN CAST(ue.m AS DOUBLE)
                ELSE ({KMV_K} - 1) * CAST({KMV_SPACE} AS DOUBLE)
                     / CAST(ue.kth AS DOUBLE) END AS est_union
    FROM pairs p
    JOIN inter_c ic ON ic.type_a = p.type_a AND ic.type_b = p.type_b
    JOIN uni_est ue ON ue.type_a = p.type_a AND ue.type_b = p.type_b
    JOIN exact_n na ON na.event_type = p.type_a
    JOIN exact_n nb ON nb.event_type = p.type_b
    LEFT JOIN exact_inter ei ON ei.type_a = p.type_a AND ei.type_b = p.type_b
    """,
    tags=("quality", "sketch", "north-star"),
)
def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on KMV sketches, audited against
    the exact answers: for every event-type pair, estimate |A∩B| and
    |A∪B| from the two k-minimum-value sketches alone — the
    audience-overlap question ("how many users both click AND purchase")
    answered WITHOUT re-scanning the raw data per pair.

    Mechanics (all md5-deterministic, hash-portable): θ_X = the k-th
    smallest hash of X (or the full space M when |X| < k, i.e. the sketch
    is exact); intersection estimate = |S_A ∩ S_B ∩ [0, θ)| · M / θ with
    θ = min(θ_A, θ_B); union estimate = the KMV estimator over the
    k-smallest of S_A ∪ S_B (sketch mergeability, pytest-proven above).
    Accuracy is pytest-bounded; the ORACLE verifies the estimates
    themselves bit-for-bit.

    Scale posture: after the one distinct + per-group k-smallest pass
    that kmv_distinct_users already demonstrates (salted two-level top-k
    there; plain windows here match the oracle's form on ≤ k·|types|
    rows), EVERY pairwise estimate works on |types|·k sketch rows —
    pairwise set analytics over billions of users without a pairwise
    scan. The exact audit columns are the only full-data joins."""
    from pyspark.sql.window import Window

    e = load_table(spark, "events", sf_dir)
    du = e.select("event_type", "user_id").distinct()
    h = du.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "h")
        # r15 opt: pin the sketch relation (bounded: ≤ k rows per event
        # type) — it feeds FIVE downstream subtrees (theta, both pair
        # sides of `common`, the union merge, and through them the final
        # joins), and several sit under broadcast branches where
        # ReuseExchange cannot dedupe, so the distinct+window sketch
        # pass re-ran per reference: the plan carried 37 Exchanges / 30
        # Sorts for a |types|·k-row intermediate. Pinned: 2.1-2.4 →
        # ~1.3 s at sf0.1 and the plan the final action analyzes shrinks
        # to the audit joins plus scans of the pinned rows.
        .localCheckpoint(eager=True)
    )
    theta = sk.groupBy("event_type").agg(
        F.max("h").alias("kth"), F.count("*").cast("long").alias("m")
    )
    types = e.select("event_type").distinct()
    th = F.when(F.col("m") < KMV_K, F.lit(KMV_SPACE).cast("bigint")).otherwise(
        F.col("kth")
    )
    ta = theta.select(
        F.col("event_type").alias("type_a"), th.alias("th_a")
    )
    tb = theta.select(
        F.col("event_type").alias("type_b"), th.alias("th_b")
    )
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
        .join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .withColumn("theta", F.least("th_a", "th_b"))
    )
    # common sketch hashes per pair FIRST, then a pair-preserving left
    # join: a pair whose sketches share nothing must still emit c = 0
    sa = sk.select(F.col("event_type").alias("type_a"), F.col("h").alias("ch"))
    sb = sk.select(F.col("event_type").alias("type_b"), F.col("h").alias("hb"))
    common = (
        sa.join(
            sb,
            (sb["hb"] == sa["ch"]) & (sa["type_a"] < sb["type_b"]),
        )
        .select("type_a", "type_b", "ch")
    )
    inter_c = (
        pairs.join(
            common,
            (common["type_a"] == pairs["type_a"])
            & (common["type_b"] == pairs["type_b"])
            & (common["ch"] < pairs["theta"]),
            "left",
        )
        .drop(common["type_a"])
        .drop(common["type_b"])
        .groupBy("type_a", "type_b", "theta")
        .agg(F.count("ch").cast("long").alias("c"))
    )
    merged = (
        pairs.select("type_a", "type_b")
        .join(
            sk,
            (sk["event_type"] == F.col("type_a"))
            | (sk["event_type"] == F.col("type_b")),
        )
        .select("type_a", "type_b", "h")
        .distinct()
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy("h")
    uni_est = (
        merged.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("type_a", "type_b")
        .agg(F.max("h").alias("ukth"), F.count("*").cast("long").alias("um"))
    )
    exact_inter = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    exact_n = du.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    est_union = F.when(F.col("um") < KMV_K, F.col("um").cast("double")).otherwise(
        F.lit(float(KMV_K - 1))
        * F.lit(float(KMV_SPACE))
        / F.col("ukth").cast("double")
    )
    return (
        pairs.join(inter_c, ["type_a", "type_b", "theta"])
        .join(uni_est, ["type_a", "type_b"])
        .join(
            F.broadcast(exact_n.select(F.col("event_type").alias("type_a"),
                                       F.col("n").alias("na"))),
            "type_a",
        )
        .join(
            F.broadcast(exact_n.select(F.col("event_type").alias("type_b"),
                                       F.col("n").alias("nb"))),
            "type_b",
        )
        .join(exact_inter, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce("n_inter", F.lit(0).cast("bigint")).alias("n_inter_exact"),
            (
                F.col("c").cast("double")
                * F.lit(float(KMV_SPACE))
                / F.col("theta").cast("double")
            ).alias("est_inter"),
            (F.col("na") + F.col("nb") - F.coalesce("n_inter", F.lit(0)))
            .cast("bigint")
            .alias("n_union_exact"),
            est_union.alias("est_union"),
        )
    )


# --- portable HyperLogLog (r05 session 3) ----------------------------------
#
# Spark's approx_count_distinct IS HyperLogLog++, but its register layout
# is engine-private (xxhash64 + dense/sparse encodings), so it can never
# be driver-oracle-verified. This build makes the register file itself
# portable: md5 -> 60-bit hash, low HLL_B bits pick the register, the
# leading-zero rank of the remaining bits is computed EXACTLY via
# length(bin(x)) (both engines print minimal binary strings), and the
# harmonic-mean denominator is kept as an exact BIGINT (sum of 1<<(55-M_j),
# scaled by 2^55) so the only float ops are one literal-over-double
# division plus a literal lookup for the linear-counting branch — every
# float literal is a Python-repr'd double CAST from a string, parsed
# identically by Spark and DuckDB.

HLL_B = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_B
HLL_REM_BITS = 60 - HLL_B  # rho ranges over 1..HLL_REM_BITS+1
_HLL_RHO_MAX = HLL_REM_BITS + 1  # 55
_HLL_ALPHA = 0.709  # published alpha_m for m = 64 (Flajolet et al. 2007)


def _hll_est_sql() -> str:
    """The estimate expression over (v_empty, s_scaled) — ONE string used
    verbatim by both the Spark plan (F.expr) and the DuckDB oracle, so the
    float path cannot diverge. Linear-counting values m*ln(m/V) are
    precomputed Python doubles embedded as CAST('...' AS DOUBLE) literals
    (a bare decimal literal would parse as DECIMAL in DuckDB)."""
    import math

    c = repr(_HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RHO_MAX))
    raw = f"(CAST('{c}' AS DOUBLE) / CAST(s_scaled AS DOUBLE))"
    lc_whens = " ".join(
        f"WHEN {v} THEN CAST('{repr(HLL_M * math.log(HLL_M / v))}' AS DOUBLE)"
        for v in range(1, HLL_M)
    )
    thr = repr(2.5 * HLL_M)
    return (
        f"CASE WHEN {raw} <= CAST('{thr}' AS DOUBLE) AND v_empty > 0 "
        f"THEN (CASE v_empty {lc_whens} END) ELSE {raw} END"
    )


@register(
    "hll_distinct_users",
    oracle=f"""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM du),
    reg AS (
      SELECT event_type, h % {HLL_M} AS idx, h // {HLL_M} AS rem FROM h),
    rho AS (
      SELECT event_type, idx,
             CASE WHEN rem = 0 THEN {_HLL_RHO_MAX}
                  ELSE {_HLL_RHO_MAX} - length(bin(rem)) END AS rho
      FROM reg),
    regs AS (
      SELECT event_type, idx, MAX(rho) AS m_j FROM rho GROUP BY 1, 2),
    agg AS (
      SELECT event_type,
             CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_RHO_MAX} - m_j)) AS BIGINT)
               AS s_present,
             CAST(COUNT(*) AS BIGINT) AS n_present
      FROM regs GROUP BY 1),
    sk AS (
      SELECT event_type,
             CAST({HLL_M} - n_present AS BIGINT) AS v_empty,
             CAST(s_present + ({HLL_M} - n_present)
                  * (CAST(1 AS BIGINT) << {_HLL_RHO_MAX}) AS BIGINT) AS s_scaled
      FROM agg),
    exact AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY 1)
    SELECT event_type, n_exact, v_empty, s_scaled,
           {_hll_est_sql()} AS est_distinct
    FROM exact JOIN sk USING (event_type)
    """,
    tags=("quality", "sketch", "north-star", "hll"),
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count per event type with a PORTABLE register
    file — the complement to ``kmv_distinct_users`` (whose docstring notes
    built-in HLLs are engine-private: this query is the explicit-register
    rebuttal). md5 60-bit hash; low {HLL_B} bits -> register index; rho =
    leading-zero rank of the remaining {HLL_REM_BITS} bits, computed
    exactly as {_HLL_RHO_MAX} - length(bin(rem)); registers are MAX(rho).
    The harmonic denominator stays an exact BIGINT (sum of 1<<(55-M_j) +
    empty*2^55), so raw estimate = alpha*m^2*2^55 / S is ONE float
    division, and the small-range linear-counting branch (E <= 2.5m,
    V > 0) reads m*ln(m/V) from a literal table — both from the SAME
    expression string Spark and DuckDB each evaluate (``_hll_est_sql``).
    The 2^32 large-range correction is moot in a 2^60 hash space.

    Scale posture: two map-side-combining shuffles — (type, register)
    MAX, then a {HLL_M}-row-per-type rollup; constant state per group, and
    the register file is MERGEABLE by elementwise MAX (pytest-proven), the
    property that lets 1000 executors sketch independently and combine."""
    e = load_table(spark, "events", sf_dir)
    du = e.select("event_type", "user_id").distinct()
    reg = du.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    ).select(
        "event_type",
        F.pmod("h", F.lit(HLL_M)).alias("idx"),
        F.expr(f"h div {HLL_M}").alias("rem"),
    )
    rho = reg.select(
        "event_type",
        "idx",
        F.when(F.col("rem") == 0, F.lit(_HLL_RHO_MAX))
        .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.bin("rem")))
        .alias("rho"),
    )
    regs = rho.groupBy("event_type", "idx").agg(F.max("rho").alias("m_j"))
    agg = regs.groupBy("event_type").agg(
        F.sum(
            F.expr(
                f"cast(shiftleft(cast(1 as bigint), "
                f"cast({_HLL_RHO_MAX} - m_j as int)) as bigint)"
            )
        )
        .cast("bigint")
        .alias("s_present"),
        F.count("*").cast("long").alias("n_present"),
    )
    sk = agg.select(
        "event_type",
        (F.lit(HLL_M) - F.col("n_present")).cast("bigint").alias("v_empty"),
        (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("n_present")) * F.lit(1 << _HLL_RHO_MAX)
        )
        .cast("bigint")
        .alias("s_scaled"),
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(sk, "event_type").select(
        "event_type",
        "n_exact",
        "v_empty",
        "s_scaled",
        F.expr(_hll_est_sql()).alias("est_distinct"),
    )
