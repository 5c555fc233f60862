"""Storage-layout mechanics: bucketed joins avoid shuffles; date
partitioning prunes directories. The explain output is the assertion."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from imdb_mapreduce_spark.sources.star import load_table
from imdb_mapreduce_spark.sources.storage import (
    read_partitioned,
    write_bucketed,
    write_date_partitioned,
)

SF = "/root/testdata/sf0.001"


def _explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return spark  # session catalog backed by local warehouse dir


def test_bucketed_group_by_needs_no_exchange(spark):
    o = load_table(spark, "orders", SF)
    write_bucketed(o, "orders_bucketed", "o_custkey", buckets=4)
    t = spark.table("orders_bucketed")
    agg = t.groupBy("o_custkey").agg(F.count("*").alias("n"))
    plan = _explain(agg)
    assert "Exchange" not in plan  # aggregation runs on the bucket layout
    assert agg.count() > 0


def test_bucketed_join_is_shuffle_free_on_bucket_key(spark):
    o = load_table(spark, "orders", SF)
    l = load_table(spark, "lineitem", SF)
    write_bucketed(o, "o_b", "o_orderkey", buckets=4)
    write_bucketed(
        l.select(F.col("l_orderkey"), "l_partkey", "l_quantity"), "l_b", "l_orderkey", 4
    )
    joined = (
        spark.table("l_b")
        .hint("merge")  # force the non-broadcast path: bucketing must carry it
        .join(spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = _explain(joined)
    # co-bucketed scan on both sides: no shuffle exchange before the join
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert joined.count() > 0


def test_bucketed_bfs_round_join_needs_no_edge_shuffle(spark):
    """The operators/graph.py scale claim, exercised: with the edge table
    persisted in TWO bucketed layouts (hashed on node_col for the outbound
    hop, on via_col for the return hop — the durable analog of the
    reference's forward/inverted adjacency copies) a BFS round never
    re-shuffles the big table, even with every broadcast disabled. Only
    the tiny frontier-derived sides exchange."""
    from imdb_mapreduce_spark.operators.graph import bipartite_bfs

    l = load_table(spark, "lineitem", SF)
    edges = l.select(
        F.col("l_partkey").cast("string").alias("part"),
        F.col("l_orderkey").cast("string").alias("order"),
    )
    write_bucketed(edges, "bfs_edges_by_part", "part", buckets=4)
    write_bucketed(edges, "bfs_edges_by_order", "order", buckets=4)
    root = edges.first()["part"]

    # Force the shuffle-join path bucketing must carry: drop our hints via
    # max_broadcast_rows=0 AND stop Catalyst auto-broadcasting the tiny
    # sf0.001 tables (at the scale this simulates, nothing here is small).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        res = bipartite_bfs(
            spark.table("bfs_edges_by_part"),
            node_col="part",
            via_col="order",
            root=root,
            level=2,
            checkpoint=False,
            max_broadcast_rows=0,
            edges_inverted=spark.table("bfs_edges_by_order"),
        )
        plan = _explain(res.edges)
        n = res.edges.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # The edge-table sides of both per-round joins read the bucket layout
    # directly: no Exchange on the outbound hop key (_n1) or the return
    # hop key (_v2). (Frontier-side exchanges remain — they're rows, not TB.)
    assert "BroadcastHashJoin" not in plan
    # (formatted mode names exchange keys in Arguments: lines; the same
    # run WITHOUT bucketed layouts shows hashpartitioning(_n1#…) and
    # hashpartitioning(_v2#…) exchanges — verified when writing the test)
    assert "hashpartitioning(_n1" not in plan
    assert "hashpartitioning(_v2" not in plan
    # the frontier-derived sides still exchange — rows, not terabytes
    assert "hashpartitioning(src" in plan
    assert n > 0


def test_ivf_cell_partition_layout_prunes_probed_cells(spark, tmp_path):
    """The IVF index layout claim (pipeline/similarity.ivf_index docstring):
    persist cell assignments partitioned BY cell, and a query reads only
    its probed cells' directories — partition pruning at planning time,
    not a post-scan filter. This is what makes IVF sub-linear in I/O, not
    just in compute."""
    from imdb_mapreduce_spark.pipeline.similarity import ivf_cells
    from imdb_mapreduce_spark.sources.star import load_table as lt

    emb = lt(spark, "embeddings", SF)
    cells = ivf_cells(emb)
    path = str(tmp_path / "corpus_by_cell")
    cells.write.mode("overwrite").partitionBy("cell").parquet(path)
    back = read_partitioned(spark, path)
    probed = back.filter(F.col("cell").isin(0, 3))
    plan = _explain(probed)
    # the IN-list lands in PartitionFilters (directory pruning), and the
    # data scan reads only the payload columns
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "IN (0,3)" in pf
    n_probed = probed.count()
    assert 0 < n_probed < back.count()  # strictly fewer rows than the corpus


def test_registered_ivf_query_reads_persisted_index(spark):
    """VERDICT r03 item 6: the REGISTERED ann_ivf_topk must be a pure read
    of the persisted cell-partitioned index — probe IN-list in
    PartitionFilters, and no KMeans refit on a second call (the index
    build is once per corpus fingerprint)."""
    import json
    import os

    from imdb_mapreduce_spark.pipeline.similarity import (
        _ivf_index_dir,
        ann_ivf_topk,
    )

    df = ann_ivf_topk(spark, SF)  # builds the index iff absent/stale
    plan = _explain(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf, "registered IVF query must scan the cell-partitioned index"
    assert "IN (" in pf[0], f"probe IN-list not pruned: {pf[0]}"
    assert "KMeans" not in plan
    # second call: same fingerprint → no rebuild (meta mtime unchanged)
    idx = _ivf_index_dir(spark, SF, k=8, seed=42)
    meta = os.path.join(idx, "_meta.json")
    before = os.stat(meta).st_mtime_ns
    ann_ivf_topk(spark, SF).collect()
    assert os.stat(meta).st_mtime_ns == before
    with open(meta) as f:
        assert json.load(f)["k"] == 8


def test_ivf_delete_in_place_touches_only_erased_cells(spark, tmp_path):
    """The r15 index-erasure claim (`ivf_delete_in_place`): deleting
    erased vectors rewrites ONLY the cell directories that held them —
    untouched cells' files are byte-level undisturbed (same names,
    sizes, mtimes: never opened for write, moved, or rewritten) — and
    the repaired index content equals the original minus the erased
    rows exactly."""
    import os

    from imdb_mapreduce_spark.pipeline.similarity import (
        _assigned_cells,
        ivf_delete_in_place,
    )

    # 4 well-separated unit pivots; 40 vectors each perturbed toward its
    # owning pivot → deterministic cells 0..3
    pivots = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
    ]
    rows = []
    for i in range(40):
        base = [0.05, 0.05, 0.05, 0.05]
        base[i % 4] = 1.0
        base[(i // 4) % 4] += 0.01 * (i % 3)
        rows.append((i, [float(x) for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cells_dir = str(tmp_path / "cells")
    _assigned_cells(emb, pivots).write.partitionBy("cell").parquet(cells_dir)

    def listing():
        out = {}
        for entry in os.listdir(cells_dir):
            if not entry.startswith("cell="):
                continue
            d = os.path.join(cells_dir, entry)
            out[entry] = sorted(
                (f, os.stat(os.path.join(d, f)).st_size,
                 os.stat(os.path.join(d, f)).st_mtime_ns)
                for f in os.listdir(d)
            )
        return out

    before_files = listing()
    before_rows = {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(cells_dir).collect()
    }
    # erase two vectors that both live in cell 0 (vec_id ≡ 0 mod 4)
    erased_ids = [0, 4]
    erased = emb.filter(F.col("vec_id").isin(erased_ids)).select(
        "vec_id", "embedding"
    )
    touched = ivf_delete_in_place(spark, cells_dir, erased, pivots)
    assert touched == [0]
    after_files = listing()
    # untouched cells: byte-level undisturbed
    for entry, files in before_files.items():
        if entry != "cell=0":
            assert after_files[entry] == files, entry
    # touched cell: rewritten (different file set) and erased rows gone
    assert after_files["cell=0"] != before_files["cell=0"]
    after_rows = {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(cells_dir).collect()
    }
    assert after_rows == {
        (v, c) for v, c in before_rows if v not in erased_ids
    }
    # erasing nothing is a no-op that touches no directory
    assert ivf_delete_in_place(spark, cells_dir, emb.filter("false"), pivots) == []
    assert listing() == after_files
    # erasing EVERY remaining vector of one cell must remove its
    # directory outright: dynamic partition overwrite cannot rewrite a
    # partition with zero rows, so without the directory drop the
    # deleted vectors would survive on disk (r15 review catch)
    cell1_ids = [v for v, c in after_rows if c == 1]
    assert cell1_ids, "fixture must populate cell 1"
    wipe = emb.filter(F.col("vec_id").isin(cell1_ids)).select(
        "vec_id", "embedding"
    )
    assert ivf_delete_in_place(spark, cells_dir, wipe, pivots) == [1]
    assert "cell=1" not in listing()
    final_rows = {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(cells_dir).collect()
    }
    assert final_rows == {
        (v, c) for v, c in after_rows if v not in set(cell1_ids)
    }


def test_cdc_join_on_bucketed_base_shuffles_only_updates(spark):
    """The bucketed-base CDC claim: with orders bucketed on the merge key,
    the join-formulated upsert exchanges ONLY the update batch — the base
    side reads its bucket layout directly."""
    from imdb_mapreduce_spark.pipeline.curation import cdc_upsert_join
    from imdb_mapreduce_spark.sources.storage import write_bucketed

    orders = load_table(spark, "orders", SF)
    write_bucketed(orders, "orders_cdc_base", "o_orderkey")
    base = spark.table("orders_cdc_base")
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
    )
    merged = cdc_upsert_join(base, updates, "o_orderkey")
    plan = _explain(merged)
    # exactly one exchange on the merge key — the update side
    assert plan.count("hashpartitioning(o_orderkey") == 1, plan
    # and the merge itself is correct: updated rows flipped, count stable
    assert merged.count() == orders.count()
    assert (
        merged.filter(F.col("o_orderkey") % 10 == 0)
        .filter(F.col("o_orderstatus") != "U")
        .count()
        == 0
    )


def test_cdc_join_equals_window_formulation(spark):
    """cdc_upsert_join must produce the registered window-formulated
    result row-for-row (same update batch, same precedence)."""
    from imdb_mapreduce_spark.pipeline.curation import (
        cdc_orders_upsert,
        cdc_upsert_join,
    )

    orders = load_table(spark, "orders", SF)
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    base = orders.select(
        "o_orderkey", "o_orderstatus", cents.alias("price_cents")
    )
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        F.expr(
            "(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) * 11) div 10"
        ).alias("price_cents"),
    )
    via_join = {
        r["o_orderkey"]: (r["o_orderstatus"], r["price_cents"])
        for r in cdc_upsert_join(base, updates, "o_orderkey").collect()
    }
    via_window = {
        r["o_orderkey"]: (r["o_orderstatus"], r["price_cents"])
        for r in cdc_orders_upsert(spark, SF).collect()
    }
    assert via_join == via_window


def test_schema_evolution_merge_read(spark, tmp_path):
    """Evolving a silver table in place: files written before a column
    existed coexist with files written after. mergeSchema unifies them
    (old rows read NULL for the new column) — the at-rest contract that
    lets a 100 TB table gain a column without a rewrite."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").write.parquet(
        path
    )
    spark.createDataFrame(
        [(3, "c", 30)], "id long, v string, score long"
    ).write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert dict(merged.dtypes) == {"id": "bigint", "v": "string", "score": "bigint"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: 30}


def test_date_partition_pruning(spark, tmp_path):
    e = load_table(spark, "events", SF)
    path = str(tmp_path / "events_by_day")
    write_date_partitioned(e, path)
    back = read_partitioned(spark, path)
    one_day = back.filter(F.col("event_date") == "2024-01-03")
    plan = _explain(one_day)
    # the date predicate must prune partitions at planning, not post-scan
    assert "PartitionFilters: [isnotnull(event_date" in plan
    n = one_day.count()
    assert 0 < n < e.count()
    # value integrity after the partition round-trip
    assert back.count() == e.count()


def test_compaction_rewrites_small_files_and_keeps_rows(spark, tmp_path):
    """A fragmented write (many tiny files) compacts to the footer-derived
    target count, row-for-row equal, and sort_within_by restores per-file
    clustering (min/max ranges disjoint-ish again)."""
    from imdb_mapreduce_spark.sources.storage import (
        compact_parquet_dir,
        compaction_plan,
    )

    src = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    df = spark.range(10_000).selectExpr("id AS k", "id % 97 AS v")
    df.repartition(64).write.parquet(src)  # 64 tiny files

    plan = compaction_plan(src, target_bytes=1024 * 1024)
    assert plan["n_files"] == 64
    assert plan["small_files"] == 64
    assert plan["target_files"] < 64

    res = compact_parquet_dir(
        spark, src, out, target_bytes=1024 * 1024, sort_within_by="k"
    )
    assert res["after"]["n_files"] == plan["target_files"]
    a = sorted(r["k"] for r in spark.read.parquet(src).collect())
    b = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert a == b
    # per-file clustering: every output file's k-range is internally sorted
    import glob

    import pyarrow.parquet as pq

    for f in glob.glob(out + "/*.parquet"):
        ks = pq.read_table(f, columns=["k"]).column("k").to_pylist()
        assert ks == sorted(ks)


def test_bucketed_pagerank_round_join_needs_no_edge_shuffle(spark):
    """VERDICT r06 item 5: the operators/pagerank.py scale claim,
    exercised like the BFS variant above. With the edge table bucketed on
    src (the silver copurchase_edges layout pagerank_coparts reads) and
    EVERY broadcast disabled, two full power-iteration rounds must show
    zero Exchange on the edge-side key: the degree-annotation join
    (e ⋈ deg on _src) and each round's rank ⋈ edges join all reuse the
    bucket layout. Only (node, rank)-tuple sides exchange — rows, not TB.

    Calibrated against the live plan when written: 5 exchanges for 2
    rounds, keyed node#… (nodes build + per-round rank side) and _dst#…
    (per-round contribution agg) — none keyed _src. Without the bucketed
    layout the same run shows hashpartitioning(_src#…) exchanges."""
    from imdb_mapreduce_spark.operators.pagerank import pagerank_exact

    l = load_table(spark, "lineitem", SF)
    e = l.select(
        F.col("l_partkey").alias("src"), F.col("l_orderkey").alias("dst")
    ).limit(2000)
    edges = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    write_bucketed(edges, "pr_edges_by_src", "src", buckets=4)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ranks = pagerank_exact(
            spark.table("pr_edges_by_src"),
            iterations=2,
            checkpoint_every=10**9,  # no mid-run checkpoint: keep the lineage
            max_broadcast_rows=0,  # drop our own broadcast hints too
            final_checkpoint=False,  # return the UNtruncated round plan
        )
        plan = _explain(ranks)
        n = ranks.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" not in plan
    # the edge-side join key never exchanges: both the deg-annotation join
    # and every round's rank⋈edges join read the bucket layout in place
    assert "hashpartitioning(_src" not in plan
    # the rank/contribution sides still exchange — that IS the minimal
    # per-round shuffle set (one agg exchange + one rank-side exchange)
    assert "hashpartitioning(_dst" in plan
    assert n > 0


def test_variant_column_parquet_roundtrip(spark, tmp_path):
    """The silver-layer VARIANT play (events_variant_stats' 100 TB
    posture): a parse_json column persisted to parquet must come back
    TYPED (variant logical type, not a string) and sub-field extraction
    must work on the read-back bytes without re-parsing JSON. Also pins
    the 4.1.2 capability statement in the query docstring: reading
    shredded variant is enabled by default in this engine."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "var.parquet")
    n = 1000
    df = spark.range(n).select(
        "id",
        F.parse_json(
            F.concat(F.lit('{"k": '), F.col("id").cast("string"), F.lit("}"))
        ).alias("v"),
    )
    df.write.parquet(out)
    back = spark.read.parquet(out)
    assert dict(back.dtypes)["v"] == "variant"  # typed, not a string
    got = (
        back.select(F.try_variant_get("v", "$.k", "bigint").alias("k"))
        .agg(F.sum("k").alias("s"))
        .collect()[0]["s"]
    )
    assert got == n * (n - 1) // 2
    assert spark.conf.get("spark.sql.variant.allowReadingShredded") == "true"
