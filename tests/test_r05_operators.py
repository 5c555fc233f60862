"""Semantic tests for the r05 operator additions (beyond the DuckDB
oracle parity the driver checks): triangle counting, paragraph-level
dedup, the scalable seeded global shuffle, quantile-bin quality gating,
retention cohorts, and the one-scan column profiler."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


# ---------------------------------------------------------------------------
# copurchase_triangles: hand-built graph with known triangles
# ---------------------------------------------------------------------------


def test_triangle_count_on_known_graph(spark, tmp_path):
    """Orders {1,2}: parts (1,2,3) twice → co-edges 1-2, 1-3, 2-3 all with
    support 2 → one triangle, each corner counted once. Order 3 adds a
    support-1 edge (3,4) that the min-support prune must drop."""
    rows = [
        (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3),
        (3, 3), (3, 4),
    ]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    d = str(tmp_path / "sf")
    li.write.parquet(f"{d}/lineitem.parquet")

    from imdb_mapreduce_spark.plans.graph_queries import copurchase_triangles

    out = {r["part"]: r["n_triangles"] for r in copurchase_triangles(spark, d).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# paragraph_dedup_stats: known cross-document boilerplate
# ---------------------------------------------------------------------------


def test_paragraph_dedup_flags_cross_doc_boilerplate(spark, tmp_path):
    from imdb_mapreduce_spark.pipeline.text import PARA_TOKENS, paragraph_dedup_stats

    boiler = " ".join(["spam"] * PARA_TOKENS)
    uniq1 = " ".join(f"u{i}" for i in range(PARA_TOKENS))
    uniq2 = " ".join(f"v{i}" for i in range(PARA_TOKENS))
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} {uniq1}", "en", "s", 0),
            (2, f"{boiler} {uniq2}", "en", "s", 0),
            (3, uniq2 + " tail", "en", "s", 0),  # dup of doc2's window? no —
            # doc3's first window is uniq2 tokens, doc2's SECOND window is
            # also uniq2 → cross-doc dup at paragraph level
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(f"{d}/documents.parquet")

    out = {r["doc_id"]: r.asDict() for r in paragraph_dedup_stats(spark, d).collect()}
    assert out[1]["n_paragraphs"] == 2 and out[1]["n_dup_paragraphs"] == 1
    assert out[2]["n_paragraphs"] == 2 and out[2]["n_dup_paragraphs"] == 2
    # doc3: window1 = uniq2 (dup with doc2's window2), window2 = "tail"
    assert out[3]["n_dup_paragraphs"] == 1
    assert out[2]["dup_fraction"] == 1.0


# ---------------------------------------------------------------------------
# training_shuffle_order: permutation, determinism, boundary independence
# ---------------------------------------------------------------------------


def test_shuffle_order_is_a_permutation_and_partition_invariant(spark):
    from imdb_mapreduce_spark.pipeline import curation
    from imdb_mapreduce_spark.pipeline.curation import training_shuffle_order

    out = training_shuffle_order(spark, SF_SMALL).collect()
    n = len(out)
    positions = sorted(r["shuffle_pos"] for r in out)
    assert positions == list(range(1, n + 1))  # exact permutation of 1..N

    by_doc = {r["doc_id"]: r["shuffle_pos"] for r in out}
    # partition-count independence: the rank depends only on the key's
    # total order, not where the range sampler cut
    orig = curation.SHUFFLE_PARTITIONS
    try:
        curation.SHUFFLE_PARTITIONS = 3
        again = {
            r["doc_id"]: r["shuffle_pos"]
            for r in training_shuffle_order(spark, SF_SMALL).collect()
        }
    finally:
        curation.SHUFFLE_PARTITIONS = orig
    assert again == by_doc


# ---------------------------------------------------------------------------
# quality_decile_filter: keeps exactly the top deciles per source
# ---------------------------------------------------------------------------


def test_quality_decile_filter_keeps_top_fraction(spark):
    from imdb_mapreduce_spark.plans.quality import (
        QUALITY_DECILES_KEPT,
        quality_decile_filter,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    kept = quality_decile_filter(spark, SF_SMALL)
    rows = kept.collect()
    assert rows, "gate kept nothing"
    assert all(r["decile"] >= QUALITY_DECILES_KEPT for r in rows)

    total = load_table(spark, "documents", SF_SMALL).count()
    frac = len(rows) / total
    expect = (10 - QUALITY_DECILES_KEPT + 1) / 10
    # NTILE bins are even only up to integer granularity; tiny per-source
    # doc counts at sf0.001 make the kept fraction lumpy
    assert abs(frac - expect) < 0.1

    # per-source monotonicity: every kept doc's ttr >= every dropped doc's
    # ttr within the same source (modulo the doc_id tiebreak at the cut)
    docs = load_table(spark, "documents", SF_SMALL)
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "source",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")).alias(
            "ttr"
        ),
    )
    kept_ids = {r["doc_id"] for r in rows}
    per_source = {}
    for r in scored.collect():
        per_source.setdefault(r["source"], []).append(r)
    for src, lst in per_source.items():
        kept_ttrs = [r["ttr"] for r in lst if r["doc_id"] in kept_ids]
        drop_ttrs = [r["ttr"] for r in lst if r["doc_id"] not in kept_ids]
        if kept_ttrs and drop_ttrs:
            assert min(kept_ttrs) >= max(t for t in drop_ttrs if t < min(kept_ttrs)) or (
                min(kept_ttrs) >= min(drop_ttrs)
            )


# ---------------------------------------------------------------------------
# user_retention_cohorts: offset-0 diagonal equals cohort sizes
# ---------------------------------------------------------------------------


def test_retention_offset_zero_equals_cohort_size(spark):
    from imdb_mapreduce_spark.plans.events import user_retention_cohorts
    from imdb_mapreduce_spark.sources.star import load_table

    out = user_retention_cohorts(spark, SF_SMALL).collect()
    assert out
    diag = {r["cohort_week"]: r["n_users"] for r in out if r["week_offset"] == 0}

    e = load_table(spark, "events", SF_SMALL)
    cohorts = (
        e.select("user_id", F.date_trunc("week", "ts").alias("w"))
        .groupBy("user_id")
        .agg(F.min("w").alias("cw"))
        .groupBy("cw")
        .count()
        .collect()
    )
    expected = {r["cw"]: r["count"] for r in cohorts}
    assert diag == expected
    # retention can never exceed the cohort's size
    for r in out:
        assert r["n_users"] <= expected[r["cohort_week"]]


# ---------------------------------------------------------------------------
# table_profile_orders: invariants against a direct scan
# ---------------------------------------------------------------------------


def test_table_profile_matches_direct_counts(spark):
    from imdb_mapreduce_spark.plans.quality import table_profile_orders
    from imdb_mapreduce_spark.sources.star import load_table

    prof = {r["col_name"]: r.asDict() for r in table_profile_orders(spark, SF_SMALL).collect()}
    o = load_table(spark, "orders", SF_SMALL)
    n = o.count()
    assert prof["o_orderkey"]["n_distinct"] == n  # primary key
    assert prof["o_orderkey"]["n_nulls"] == 0
    assert prof["o_orderkey"]["min_num"] == float(
        o.agg(F.min("o_orderkey")).collect()[0][0]
    )
    assert prof["o_orderstatus"]["min_num"] is None  # non-numeric: no min
    assert prof["o_totalprice"]["max_num"] == o.agg(F.max("o_totalprice")).collect()[0][0]


def test_table_profile_is_single_scan(spark):
    """The profiler must not issue one job per column: its plan reads the
    orders parquet exactly once (Expand-based multi-distinct, not a
    self-union of per-column scans)."""
    from imdb_mapreduce_spark.plans.quality import table_profile_orders

    plan = table_profile_orders(spark, SF_SMALL)._jdf.queryExecution().toString()
    assert plan.count("orders.parquet") <= 2  # logical+physical mention, 1 scan


# ---------------------------------------------------------------------------
# zorder_layout_plan: interleave correctness + bijection
# ---------------------------------------------------------------------------


def _z_ref(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_python_reference(spark):
    from imdb_mapreduce_spark.plans.analytics import Z_BITS, zorder_layout_plan
    from imdb_mapreduce_spark.sources.star import load_table
    from pyspark.sql import functions as F
    import datetime

    out = {r["o_orderkey"]: r for r in zorder_layout_plan(spark, SF_SMALL).collect()}
    orders = load_table(spark, "orders", SF_SMALL).collect()
    epoch = datetime.date(1970, 1, 1)
    for o in orders[:200]:
        ca = o["o_custkey"] % (1 << Z_BITS)
        da = (o["o_orderdate"].date() - epoch).days % (1 << Z_BITS)
        z = _z_ref(ca, da, Z_BITS)
        row = out[o["o_orderkey"]]
        assert row["zkey"] == z
        assert row["file_id"] == z >> 8


def test_zorder_is_bijective_on_cells(spark):
    from imdb_mapreduce_spark.plans.analytics import zorder_layout_plan
    from pyspark.sql import functions as F

    df = zorder_layout_plan(spark, SF_SMALL)
    n_z = df.select("zkey").distinct().count()
    # reconstruct the cell count: distinct (ca, da) == distinct z (bijection)
    from imdb_mapreduce_spark.plans.analytics import Z_BITS, EPOCH
    from imdb_mapreduce_spark.sources.star import load_table

    o = load_table(spark, "orders", SF_SMALL)
    n_cells = (
        o.select(
            (F.col("o_custkey") % (1 << Z_BITS)).alias("ca"),
            (F.datediff("o_orderdate", F.lit(EPOCH).cast("date")) % (1 << Z_BITS)).alias(
                "da"
            ),
        )
        .distinct()
        .count()
    )
    assert n_z == n_cells


# ---------------------------------------------------------------------------
# sharded ordered write: the layout step both shuffle/zorder plans document
# ---------------------------------------------------------------------------


def test_range_sharded_write_produces_disjoint_sorted_files(spark, tmp_path):
    """repartitionByRange + sortWithinPartitions + parquet write must yield
    files whose key ranges are pairwise DISJOINT and internally sorted —
    the property that makes min/max file stats prune reads (the whole
    point of the zorder/shuffle layout operators)."""
    import glob as g

    from pyspark.sql import functions as F

    from imdb_mapreduce_spark.pipeline.curation import training_shuffle_order

    df = training_shuffle_order(spark, SF_SMALL)
    out = str(tmp_path / "sharded")
    (
        df.repartitionByRange(4, "shuffle_pos")
        .sortWithinPartitions("shuffle_pos")
        .write.parquet(out)
    )
    import pyarrow.parquet as pq

    ranges = []
    for f in g.glob(f"{out}/part-*.parquet"):
        t = pq.read_table(f, columns=["shuffle_pos"])
        vals = t.column("shuffle_pos").to_pylist()
        if not vals:
            continue
        assert vals == sorted(vals), f"file {f} not internally sorted"
        ranges.append((min(vals), max(vals)))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "file key ranges overlap — stats-based pruning broken"


# ---------------------------------------------------------------------------
# kmv_distinct_users: sketch accuracy + fallback branch
# ---------------------------------------------------------------------------


def test_kmv_estimate_within_theoretical_error(spark):
    from imdb_mapreduce_spark.plans.quality import KMV_K, kmv_distinct_users

    rows = kmv_distinct_users(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        if r["n_exact"] >= KMV_K:
            rel = abs(r["est_distinct"] - r["n_exact"]) / r["n_exact"]
            # KMV std error ≈ 1/sqrt(K) ≈ 12.5% at K=64; allow 3 sigma
            assert rel < 3 / (KMV_K**0.5), (r["event_type"], rel)


def test_kmv_small_group_falls_back_to_exact(spark):
    """Groups with fewer than K distinct keys must report the exact count
    (sf0.001 has ~15 users — every group takes the m<K branch)."""
    from imdb_mapreduce_spark.plans.quality import KMV_K, kmv_distinct_users

    rows = kmv_distinct_users(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        if r["n_exact"] < KMV_K:
            assert r["est_distinct"] == float(r["n_exact"])


def test_kmv_sketch_is_mergeable(spark):
    """The 100 TB claim: K-smallest sets merged across two halves of the
    data equal the K-smallest of the whole — union then re-take K."""
    from imdb_mapreduce_spark.plans.quality import KMV_K
    from imdb_mapreduce_spark.sources.star import load_table

    e = load_table(spark, "events", "/root/testdata/sf0.01")
    h = e.select(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h")
    ).distinct()
    whole = [r["h"] for r in h.orderBy("h").limit(KMV_K).collect()]
    lo = e.filter(F.col("event_id") % 2 == 0)
    hi = e.filter(F.col("event_id") % 2 == 1)
    merged = set()
    for half in (lo, hi):
        hh = half.select(
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h")
        ).distinct()
        merged |= {r["h"] for r in hh.orderBy("h").limit(KMV_K).collect()}
    assert sorted(merged)[:KMV_K] == whole


# ---------------------------------------------------------------------------
# funnel + transitions: monotonicity and conservation invariants
# ---------------------------------------------------------------------------


def test_funnel_stages_are_monotone(spark):
    from imdb_mapreduce_spark.plans.events import event_funnel_conversion

    rows = {r["stage"]: r["n_users"] for r in event_funnel_conversion(spark, SF_SMALL).collect()}
    assert set(rows) == {"view", "view>click", "view>click>purchase"}
    assert rows["view"] >= rows["view>click"] >= rows["view>click>purchase"]
    assert rows["view"] > 0


def test_transition_bigrams_conserve_events(spark):
    """Σ transitions == Σ (events_per_user − 1): every user contributes
    exactly one fewer transition than events."""
    from imdb_mapreduce_spark.plans.events import event_transition_bigrams
    from imdb_mapreduce_spark.sources.star import load_table

    n_trans = sum(
        r["n_transitions"]
        for r in event_transition_bigrams(spark, SF_SMALL).collect()
    )
    e = load_table(spark, "events", SF_SMALL)
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert n_trans == n_events - n_users


# ---------------------------------------------------------------------------
# ranked_prefix_layout: hypothesis property vs a sequential reference
# ---------------------------------------------------------------------------


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
    nparts=st.integers(min_value=1, max_value=7),
)
def test_ranked_prefix_layout_matches_sequential_reference(spark, toks, nparts):
    """For ANY token multiset and ANY partition count, the one-exchange
    layout equals the sequential sort+cumsum: rank i and the exclusive
    prefix sum of tokens in key order."""
    from imdb_mapreduce_spark.pipeline.curation import ranked_prefix_layout

    rows = [(i, f"k{i:04d}", t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, ["rid", "k", "n_tok"])
    out = {
        r["rid"]: (r["global_rank"], r["cum_before"])
        for r in ranked_prefix_layout(df, ("k",), "n_tok", nparts).collect()
    }
    cum = 0
    for rank, (rid, _, t) in enumerate(sorted(rows, key=lambda r: r[1]), start=1):
        assert out[rid] == (rank, cum)
        cum += t


def test_triangle_broadcast_gate_fallback(spark, tmp_path, monkeypatch):
    """Force the pruned edge set past the broadcast threshold: the
    shuffle-join fallback must produce the identical triangle counts."""
    from imdb_mapreduce_spark.plans import graph_queries as gq

    rows = [
        (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3),
    ]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    d = str(tmp_path / "sf")
    li.write.parquet(f"{d}/lineitem.parquet")

    normal = {r["part"]: r["n_triangles"] for r in gq.copurchase_triangles(spark, d).collect()}
    monkeypatch.setattr(gq, "TRI_BROADCAST_MAX_EDGES", 0)
    gated = {r["part"]: r["n_triangles"] for r in gq.copurchase_triangles(spark, d).collect()}
    assert gated == normal == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# count-min sketch: one-sided error + cell-wise mergeability
# ---------------------------------------------------------------------------


def test_cm_sketch_never_underestimates(spark):
    """CM estimates are exact counts plus collision mass — the min over
    rows can overestimate but NEVER underestimate, for every key."""
    from imdb_mapreduce_spark.plans.quality import (
        CM_DEPTH,
        _cm_bucket_spark,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    e = load_table(spark, "events", SF_SMALL)
    cells = (
        e.select(
            F.posexplode(
                F.array(
                    *[_cm_bucket_spark(j, F.col("user_id")) for j in range(CM_DEPTH)]
                )
            ).alias("j", "bucket")
        )
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    exact = e.groupBy("user_id").agg(F.count("*").alias("exact_cnt"))
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
        probes.join(cells, ["j", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("cm_est"))
    )
    bad = est.filter(F.col("cm_est") < F.col("exact_cnt")).count()
    assert bad == 0


def test_cm_sketch_merges_cellwise(spark):
    """sketch(A) + sketch(B) == sketch(A ∪ B) cell-by-cell — the property
    that makes CM a partitioned/streaming aggregate."""
    from imdb_mapreduce_spark.plans.quality import CM_DEPTH, _cm_bucket_spark
    from imdb_mapreduce_spark.sources.star import load_table

    e = load_table(spark, "events", SF_SMALL)

    def sketch(df):
        return (
            df.select(
                F.posexplode(
                    F.array(
                        *[
                            _cm_bucket_spark(j, F.col("user_id"))
                            for j in range(CM_DEPTH)
                        ]
                    )
                ).alias("j", "bucket")
            )
            .groupBy("j", "bucket")
            .agg(F.count("*").alias("cnt"))
        )

    half_a = e.filter(F.col("event_id") % 2 == 0)
    half_b = e.filter(F.col("event_id") % 2 == 1)
    merged = (
        sketch(half_a)
        .unionByName(sketch(half_b))
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = sketch(e)
    diff = (
        merged.join(full, ["j", "bucket"], "full")
        .filter(
            F.coalesce(merged["cnt"], F.lit(0)) != F.coalesce(full["cnt"], F.lit(0))
        )
        .count()
    )
    assert diff == 0


# ---------------------------------------------------------------------------
# bloom filter: no false negatives, fp rate near theory
# ---------------------------------------------------------------------------


def test_bloom_filter_no_false_negatives_and_sane_fp(spark):
    import math

    from imdb_mapreduce_spark.plans.quality import (
        BLOOM_BITS,
        BLOOM_K,
        bloom_filter_prune,
    )

    row = bloom_filter_prune(spark, SF_SMALL).collect()[0]
    assert row["false_neg"] == 0  # the guarantee that makes pruning sound
    assert row["n_candidates"] >= row["n_members"]
    # theory: fp ≈ (1 − e^{−kn/m})^k; allow generous slack for small n
    n, m, k = row["n_members"], BLOOM_BITS, BLOOM_K
    theory = (1 - math.exp(-k * n / m)) ** k
    assert row["fp_rate"] <= max(0.02, 4 * theory)


# ---------------------------------------------------------------------------
# SCD2: intervals tile each user's timeline, one open interval per user
# ---------------------------------------------------------------------------


def test_scd2_intervals_tile_timeline(spark):
    from imdb_mapreduce_spark.plans.temporal_queries import user_state_scd2

    rows = user_state_scd2(spark, SF_SMALL).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r["version"])
        # versions are 1..n dense
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        # exactly one open (current) interval, and it is the last one
        assert sum(r["is_current"] for r in ivs) == 1
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to_us"] == -1
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]  # no gaps/overlaps
            assert a["event_type"] != b["event_type"]  # real state changes


# ---------------------------------------------------------------------------
# kmv set ops: estimates land near the exact intersections/unions
# ---------------------------------------------------------------------------


def test_kmv_set_ops_estimates_track_exact(spark):
    """Theta-style sketch set ops: union estimates inherit KMV's ~1/sqrt(k)
    accuracy; intersection estimates are noisier (variance scales with
    1/J·k) but must stay the right order of magnitude and be exact
    whenever both sketches are exact (|X| < k)."""
    from imdb_mapreduce_spark.plans.quality import kmv_set_ops

    rows = kmv_set_ops(spark, SF_SMALL).collect()
    assert rows  # every type pair present
    for r in rows:
        assert r["n_union_exact"] >= r["n_inter_exact"]
        assert r["est_inter"] >= 0 and r["est_union"] > 0
        # union: KMV-accuracy (generous 3x the 1/sqrt(64) bound)
        rel = abs(r["est_union"] - r["n_union_exact"]) / r["n_union_exact"]
        assert rel <= 0.5, (r["type_a"], r["type_b"], rel)
        # intersection: order-of-magnitude sanity vs the union bound
        assert r["est_inter"] <= 1.5 * r["est_union"]


# ---------------------------------------------------------------------------
# feature hashing: linearity + boundedness
# ---------------------------------------------------------------------------


def test_feature_hashing_linear_and_bounded(spark, tmp_path):
    """The hashed featurizer is LINEAR in the bag of words: the vector of
    doc A+B equals vector(A) + vector(B) element-wise, and l1 is bounded
    by the token count (signs only ever cancel)."""
    from imdb_mapreduce_spark.pipeline.text import text_feature_hashing, FH_DIM

    a = "spark makes distributed joins easy"
    b = "hash tricks make features fixed width"
    docs = spark.createDataFrame(
        [(1, a, "en", "t", len(a)), (2, b, "en", "t", len(b)),
         (3, a + " " + b, "en", "t", len(a + b) + 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r for r in text_feature_hashing(spark, d).collect()}
    va = [int(x) for x in rows[1]["fvec"].split(",")]
    vb = [int(x) for x in rows[2]["fvec"].split(",")]
    vab = [int(x) for x in rows[3]["fvec"].split(",")]
    assert len(va) == FH_DIM
    assert vab == [x + y for x, y in zip(va, vb)]
    assert rows[1]["l1"] <= len(a.split(" "))
    assert rows[3]["nnz"] <= rows[1]["nnz"] + rows[2]["nnz"]


# ---------------------------------------------------------------------------
# zone-map audit: the layouts must rank the way the theory says
# ---------------------------------------------------------------------------


def test_zone_map_audit_ranks_layouts(spark):
    """custsort must prune custkey probes hardest but fail day ranges;
    z-order must prune BOTH dimensions well; natural order must prune
    neither. This is the quantitative argument for multi-dimensional
    clustering — if a layout change breaks it, the audit catches it."""
    from imdb_mapreduce_spark.plans.analytics import zone_map_prune_audit

    rows = {
        (r["layout"], r["probe_kind"]): r["scan_fraction"]
        for r in zone_map_prune_audit(spark, SF_SMALL).collect()
    }
    assert rows[("custsort", "custkey_point")] < 0.2
    assert rows[("zorder", "custkey_point")] < 0.5
    assert rows[("natural", "custkey_point")] > 0.9
    assert rows[("zorder", "day_range")] < 0.5
    assert rows[("custsort", "day_range")] > 0.7
    assert rows[("natural", "day_range")] > 0.7
    # z-order's whole point: best COMBINED worst-case across dimensions
    worst = {
        lay: max(rows[(lay, "custkey_point")], rows[(lay, "day_range")])
        for lay in ("zorder", "custsort", "natural")
    }
    assert worst["zorder"] == min(worst.values())


# ---------------------------------------------------------------------------
# containment: the asymmetric case Jaccard misses
# ---------------------------------------------------------------------------


def test_containment_catches_embedded_quote(spark, tmp_path):
    """A short doc fully embedded in a long one: containment 1.0 even
    though Jaccard is small — the case this operator exists for."""
    from imdb_mapreduce_spark.pipeline.dedup import (
        jaccard_pairs_min_threshold,
        ngram_containment_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(60))
    rows = [
        (1, short, "en", "t", len(short)),
        (2, filler + " " + short, "en", "t", 0),
        (3, "totally unrelated text about query engines and shuffles x y z",
         "en", "t", 0),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(f"{d}/documents.parquet")
    got = {
        (r["doc1"], r["doc2"]): r for r in ngram_containment_pairs(spark, d).collect()
    }
    assert (1, 2) in got
    assert got[(1, 2)]["contain_1in2"] == 1.0  # every short-doc shingle in 2
    assert got[(1, 2)]["contain_2in1"] < 0.5  # asymmetric
    # and Jaccard at the same floor would have missed it
    jac = {
        (r["doc1"], r["doc2"])
        for r in jaccard_pairs_min_threshold(docs, 0.8).collect()
    }
    assert (1, 2) not in jac


# ---------------------------------------------------------------------------
# split leakage audit: the positive control must hold
# ---------------------------------------------------------------------------


def test_split_leakage_raw_exact_is_zero_by_construction(spark):
    """Content-hash splits make byte-identical cross-split pairs
    impossible — the raw_exact tier is the audit's positive control. The
    jaccard tier's numbers must be internally consistent."""
    from imdb_mapreduce_spark.pipeline.curation import split_leakage_audit

    rows = {r["tier"]: r for r in split_leakage_audit(spark, SF_SMALL).collect()}
    assert set(rows) == {"raw_exact", "jaccard_0.3"}
    assert rows["raw_exact"]["n_cross_pairs"] == 0
    assert rows["raw_exact"]["n_test_docs_leaked"] == 0
    j = rows["jaccard_0.3"]
    assert j["n_cross_pairs"] <= j["n_pairs"]
    assert j["n_test_docs_leaked"] <= j["n_test_docs"]
    assert j["test_leak_fraction"] == (
        j["n_test_docs_leaked"] / j["n_test_docs"]
    )


# ---------------------------------------------------------------------------
# hll_distinct_users: portable HLL accuracy + register merge law
# ---------------------------------------------------------------------------


def test_hll_estimate_within_theoretical_error(spark):
    from imdb_mapreduce_spark.plans.quality import HLL_M, hll_distinct_users

    rows = hll_distinct_users(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        # HLL std error ≈ 1.04/sqrt(m) ≈ 13% at m=64; allow 3 sigma.
        # Small cardinalities route through linear counting, whose error
        # is tighter, so one bound covers both branches.
        rel = abs(r["est_distinct"] - r["n_exact"]) / max(r["n_exact"], 1)
        assert rel < 3 * 1.04 / (HLL_M**0.5), (r["event_type"], rel)


def test_hll_small_cardinality_uses_linear_counting(spark):
    """sf0.001 has ~15 users per type — raw HLL overshoots badly there;
    the linear-counting branch must engage (v_empty > 0) and land within
    a few percent of exact."""
    from imdb_mapreduce_spark.plans.quality import hll_distinct_users

    rows = hll_distinct_users(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["v_empty"] > 0
        rel = abs(r["est_distinct"] - r["n_exact"]) / max(r["n_exact"], 1)
        assert rel < 0.15, (r["event_type"], r["est_distinct"], r["n_exact"])


def test_hll_register_file_is_mergeable(spark):
    """The 100 TB claim: the register file merged across two halves of
    the data (elementwise MAX) equals the whole-data register file — the
    property that lets independent executors sketch then combine."""
    from imdb_mapreduce_spark.plans.quality import HLL_M, _HLL_RHO_MAX
    from imdb_mapreduce_spark.sources.star import load_table

    e = load_table(spark, "events", "/root/testdata/sf0.01")

    def registers(df):
        reg = df.select(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
            )
            .cast("bigint")
            .alias("h")
        ).select(
            F.pmod("h", F.lit(HLL_M)).alias("idx"),
            F.expr(f"h div {HLL_M}").alias("rem"),
        )
        rho = reg.select(
            "idx",
            F.when(F.col("rem") == 0, F.lit(_HLL_RHO_MAX))
            .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.bin("rem")))
            .alias("rho"),
        )
        return {
            r["idx"]: r["m"]
            for r in rho.groupBy("idx").agg(F.max("rho").alias("m")).collect()
        }

    whole = registers(e)
    lo = registers(e.filter(F.col("user_id") % 2 == 0))
    hi = registers(e.filter(F.col("user_id") % 2 == 1))
    merged = {
        j: max(lo.get(j, 0), hi.get(j, 0)) for j in set(lo) | set(hi)
    }
    assert merged == whole


# ---------------------------------------------------------------------------
# duplicate_span_pairs: exact-substring span semantics
# ---------------------------------------------------------------------------


def test_duplicate_spans_bounded_by_doc_length(spark):
    """A shared verbatim run can never exceed either document's token
    count, and every reported pair must clear the span floor."""
    from imdb_mapreduce_spark.pipeline.dedup import (
        DUP_SPAN_MIN,
        duplicate_span_pairs,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    sf = "/root/testdata/sf0.01"
    lens = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, "documents", sf)
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    rows = duplicate_span_pairs(spark, sf).collect()
    assert rows
    for r in rows:
        assert r["longest_span_tokens"] >= DUP_SPAN_MIN
        assert r["longest_span_tokens"] <= min(lens[r["doc1"]], lens[r["doc2"]])
        assert r["n_diagonals"] >= 1


def test_duplicate_spans_find_exact_dups_full_length(spark):
    """Byte-identical docs share their entire token stream: the reported
    span for an exact-dup pair must equal the full doc length."""
    from imdb_mapreduce_spark.pipeline.dedup import duplicate_span_pairs
    from imdb_mapreduce_spark.sources.star import load_table

    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, "documents", sf)
    dup_pair = (
        docs.alias("a")
        .join(
            docs.alias("b"),
            (F.col("a.text") == F.col("b.text"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.size(F.split(F.col("a.text"), " ")).alias("n_tokens"),
        )
        .limit(1)
        .collect()
    )
    if not dup_pair:  # corpus has no exact dups at this SF — vacuous
        return
    want = dup_pair[0]
    spans = {
        (r["doc1"], r["doc2"]): r["longest_span_tokens"]
        for r in duplicate_span_pairs(spark, sf).collect()
    }
    assert spans[(want["doc1"], want["doc2"])] == want["n_tokens"]


def test_bpe_merge_candidates_are_valid_pairs(spark):
    """Top merge candidates: 2-char pairs, descending count, and the count
    of the winner must equal an independently computed corpus total."""
    from imdb_mapreduce_spark.pipeline.text import bpe_merge_candidates
    from imdb_mapreduce_spark.sources.star import load_table

    sf = SF_SMALL
    rows = bpe_merge_candidates(spark, sf).collect()
    assert rows
    assert all(len(r["pair"]) == 2 for r in rows)
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # independent recount of the winning pair, straight over the corpus
    top = rows[0]["pair"]
    total = 0
    for (text,) in load_table(spark, "documents", sf).select("text").collect():
        for w in text.split(" "):
            if len(w) >= 2:
                total += sum(1 for i in range(len(w) - 1) if w[i : i + 2] == top)
    assert total == rows[0]["n_occurrences"]
    # n_vocab_words counts DISTINCT words containing the pair, not pair
    # positions (a word like 'coco' holds 'co' at two offsets but is one
    # vocabulary word)
    vocab = {
        w
        for (text,) in load_table(spark, "documents", sf).select("text").collect()
        for w in text.split(" ")
        if len(w) >= 2
    }
    n_words = sum(1 for w in vocab if top in w)
    assert n_words == rows[0]["n_vocab_words"]


def test_weighted_sample_membership_is_exact(spark):
    """Every document's keep/drop decision must equal the exact integer
    threshold rule recomputed independently driver-side, and long docs
    must be sampled at a higher empirical rate than short ones."""
    import hashlib

    from imdb_mapreduce_spark.pipeline.curation import (
        WSAMPLE_CAP,
        WSAMPLE_UNIT,
        weighted_sample_tokens,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    sf = "/root/testdata/sf0.01"
    docs = {
        r["doc_id"]: len(r["text"].split(" "))
        for r in load_table(spark, "documents", sf).collect()
    }
    expect = set()
    for doc_id, n_tok in docs.items():
        h = int(hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()[:15], 16)
        if h < min(n_tok, WSAMPLE_CAP) * WSAMPLE_UNIT:
            expect.add(doc_id)
    got = {r["doc_id"] for r in weighted_sample_tokens(spark, sf).collect()}
    assert got == expect
    # weighting sanity: empirical rate of the longest-doc half dominates
    med = sorted(docs.values())[len(docs) // 2]
    long_ids = {d for d, n in docs.items() if n >= med}
    short_ids = set(docs) - long_ids
    if short_ids and long_ids:
        r_long = len(got & long_ids) / len(long_ids)
        r_short = len(got & short_ids) / max(len(short_ids), 1)
        assert r_long > r_short


# ---------------------------------------------------------------------------
# bounded_sssp: min-plus iterative operator semantics
# ---------------------------------------------------------------------------


def test_bounded_sssp_matches_driver_bellman_ford(spark):
    """The delta-relaxing operator on a hand-built weighted graph must
    equal a driver-side K-round Bellman-Ford, including the bounded-hop
    semantics (a cheap long path beyond K hops must NOT win)."""
    from imdb_mapreduce_spark.operators.sssp import bounded_sssp

    #   0 -5-> 1 -5-> 2       direct heavy path
    #   0 -1-> 3 -1-> 4 -1-> 5 -1-> 2   cheap 4-hop path
    raw = [(0, 1, 5), (1, 2, 5), (0, 3, 1), (3, 4, 1), (4, 5, 1), (5, 2, 1)]
    edges = spark.createDataFrame(raw, "src bigint, dst bigint, w bigint")

    def bf(rounds):
        dist = {0: 0}
        for _ in range(rounds):
            nd = dict(dist)
            for s_, d_, w_ in raw:
                if s_ in dist and dist[s_] + w_ < nd.get(d_, 1 << 60):
                    nd[d_] = dist[s_] + w_
            dist = nd
        return dist

    for rounds in (2, 3, 4):
        got = {
            r["node"]: r["dist"]
            for r in bounded_sssp(edges, 0, rounds=rounds, checkpoint=False).collect()
        }
        assert got == bf(rounds), rounds
    # at 2 rounds the heavy 2-hop path wins (10); by 4 the cheap one (4)
    assert bf(2)[2] == 10 and bf(4)[2] == 4


def test_bounded_sssp_early_exit_on_drained_frontier(spark):
    """A graph that converges in 1 round must return identical results
    for any larger round budget (the frontier drains; extra rounds are
    no-ops, exercised with the broadcast gate forced off)."""
    from imdb_mapreduce_spark.operators.sssp import bounded_sssp

    edges = spark.createDataFrame(
        [(0, 1, 2), (0, 2, 7)], "src bigint, dst bigint, w bigint"
    )
    one = {
        r["node"]: r["dist"]
        for r in bounded_sssp(
            edges, 0, rounds=1, checkpoint=False, max_broadcast_rows=0
        ).collect()
    }
    five = {
        r["node"]: r["dist"]
        for r in bounded_sssp(
            edges, 0, rounds=5, checkpoint=False, max_broadcast_rows=0
        ).collect()
    }
    assert one == five == {0: 0, 1: 2, 2: 7}


def test_span_merge_matches_bruteforce_lcs_on_random_corpora(spark):
    """Randomized (fixed-seed) ground-truth check: for small synthetic
    corpora, the operator's longest_span_tokens per pair must equal the
    longest common CONTIGUOUS token run computed by a brute-force driver
    LCS, whenever that run reaches the gram size — across three seeds."""
    import hashlib
    import random

    from imdb_mapreduce_spark.pipeline.dedup import span_pairs_from_grams

    K = 5  # small gram for dense matches at toy sizes

    def lcs_tokens(a, b):
        best = 0
        la, lb = len(a), len(b)
        for i in range(la):
            for j in range(lb):
                run = 0
                while i + run < la and j + run < lb and a[i + run] == b[j + run]:
                    run += 1
                best = max(best, run)
        return best

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]
        docs = []
        for d in range(8):
            toks = [rng.choice(vocab) for _ in range(rng.randint(K, 40))]
            docs.append(toks)
        # a couple of planted copies: doc 8 embeds doc 0's middle run
        planted = docs[1][:3] + docs[0][5:25] + docs[2][:4]
        docs.append(planted)
        rows = []
        for d, toks in enumerate(docs):
            n = len(toks)
            assert n >= K  # ground truth below only records runs >= K
            for i in range(1, n - K + 2):
                gram = " ".join(toks[i - 1 : i - 1 + K])
                h = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
                rows.append((d, i, h))
        grams = spark.createDataFrame(rows, "doc_id bigint, pos bigint, h bigint")
        got = {
            (r["doc1"], r["doc2"]): r["longest_span_tokens"]
            for r in span_pairs_from_grams(grams, K, min_span=K).collect()
        }
        want = {}
        for a in range(len(docs)):
            for b in range(a + 1, len(docs)):
                run = lcs_tokens(docs[a], docs[b])
                if run >= K:
                    want[(a, b)] = run
        assert got == want, (seed, got, want)


def test_paragraph_scrub_identity_and_consistency(spark):
    """Scrub invariants: a doc with zero boilerplate windows must rebuild
    to its EXACT original text (chunk->reassemble roundtrip identity), and
    kept-counts must reconcile with paragraph_dedup_stats
    (kept = total - dup, since SCRUB_MAX_FREQ == 1)."""
    from imdb_mapreduce_spark.pipeline.text import (
        SCRUB_MAX_FREQ,
        paragraph_scrub_rebuild,
    )
    from imdb_mapreduce_spark.pipeline.text import paragraph_dedup_stats
    from imdb_mapreduce_spark.sources.star import load_table

    assert SCRUB_MAX_FREQ == 1  # the reconciliation below depends on it
    sf = "/root/testdata/sf0.01"
    scrub = {r["doc_id"]: r for r in paragraph_scrub_rebuild(spark, sf).collect()}
    stats = {r["doc_id"]: r for r in paragraph_dedup_stats(spark, sf).collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, "documents", sf).collect()
    }
    assert set(scrub) == set(stats) == set(texts)
    n_identity = 0
    for doc_id, r in scrub.items():
        st = stats[doc_id]
        assert r["n_paragraphs"] == st["n_paragraphs"]
        assert r["n_kept"] == st["n_paragraphs"] - st["n_dup_paragraphs"]
        if r["n_kept"] == r["n_paragraphs"]:
            assert r["scrubbed_text"] == texts[doc_id]
            n_identity += 1
    assert n_identity > 0  # the identity branch is actually exercised


# ---------------------------------------------------------------------------
# bounded_sssp: hypothesis properties vs driver-side Bellman-Ford
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # src
        st.integers(min_value=0, max_value=6),  # dst
        st.integers(min_value=1, max_value=5),  # w
    ),
    min_size=1,
    max_size=14,
).filter(lambda es: any(s == 0 for s, _, _ in es))  # source has out-edges


@given(raw=_edges_strategy, rounds=st.integers(min_value=1, max_value=4))
@settings(max_examples=10, deadline=None)
def test_sssp_equals_driver_bellman_ford_on_random_digraphs(
    spark, raw, rounds
):
    """For arbitrary small digraphs (self-loops, parallel edges, cycles
    included) the delta-relaxing operator must equal a driver-side
    K-round full-relaxation Bellman-Ford exactly."""
    from imdb_mapreduce_spark.operators.sssp import bounded_sssp

    # parallel edges collapse to their min weight (the operator's join
    # relaxes all of them; min wins) — mirror that in the ground truth
    edges = spark.createDataFrame(raw, "src bigint, dst bigint, w bigint")
    dist = {0: 0}
    for _ in range(rounds):
        nd = dict(dist)
        for s_, d_, w_ in raw:
            if s_ in dist and dist[s_] + w_ < nd.get(d_, 1 << 60):
                nd[d_] = dist[s_] + w_
        dist = nd
    got = {
        r["node"]: r["dist"]
        for r in bounded_sssp(edges, 0, rounds=rounds, checkpoint=False).collect()
    }
    assert got == dist, (raw, rounds)


def test_minhash_eval_metrics_invariants(spark):
    """Eval-metric sanity: hits bounded by both sides, ratios consistent
    with the counts, and the LSH's exact-dup guarantee holds (a pair of
    byte-identical docs has identical signatures, so candidates must
    cover ALL exact-dup pairs -> if truth is exact-dup-only, recall=1)."""
    from imdb_mapreduce_spark.pipeline.dedup import minhash_eval_metrics

    r = minhash_eval_metrics(spark, "/root/testdata/sf0.01").collect()[0]
    assert r["n_hit"] <= min(r["n_candidates"], r["n_true_pairs"])
    assert abs(r["lsh_precision"] - r["n_hit"] / r["n_candidates"]) < 1e-12
    assert abs(r["lsh_recall"] - r["n_hit"] / r["n_true_pairs"]) < 1e-12
