"""Silver-layer materialization: build-once, fingerprint-keyed staleness."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from imdb_mapreduce_spark.sources.silver import materialized


def test_materialized_builds_once_and_rebuilds_on_source_change(spark, tmp_path):
    sf_dir = str(tmp_path)
    src = os.path.join(sf_dir, "documents.parquet")
    spark.range(5).select(F.col("id").alias("doc_id")).coalesce(1).write.parquet(src)

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.read.parquet(src).withColumn("x", F.col("doc_id") * 2)

    # three reads, one build
    for _ in range(3):
        got = materialized(spark, sf_dir, "t", "documents", {"v": 1}, build)
        assert {r["x"] for r in got.collect()} == {0, 2, 4, 6, 8}
    assert calls["n"] == 1

    # parameter change → rebuild (params are part of the staleness key)
    materialized(spark, sf_dir, "t", "documents", {"v": 2}, build)
    assert calls["n"] == 2

    # source data change → rebuild; consumer sees the NEW data
    spark.range(3).select(F.col("id").alias("doc_id")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    got = materialized(spark, sf_dir, "t", "documents", {"v": 2}, build)
    assert calls["n"] == 3
    assert {r["x"] for r in got.collect()} == {0, 2, 4}


def test_keep_list_second_call_reads_silver(spark):
    """The registered corpus_keep_list must not recompute clustering on a
    second call: the silver meta is untouched and results are identical."""
    import json

    from imdb_mapreduce_spark.pipeline.dedup import corpus_keep_list
    from imdb_mapreduce_spark.sources.silver import silver_root

    sf = "/root/testdata/sf0.001"
    first = {r["doc_id"]: (r["keep"], r["drop_reason"]) for r in corpus_keep_list(spark, sf).collect()}
    meta = os.path.join(silver_root(), "sf0.001", "dedup_clusters", "_meta.json")
    assert os.path.exists(meta)
    mtime = os.stat(meta).st_mtime_ns
    with open(meta) as f:
        assert json.load(f)["src"] == f"{sf}/documents.parquet"
    second = {r["doc_id"]: (r["keep"], r["drop_reason"]) for r in corpus_keep_list(spark, sf).collect()}
    assert os.stat(meta).st_mtime_ns == mtime  # no rebuild
    assert first == second


def test_materialized_recovers_from_torn_meta_and_deleted_data(spark, tmp_path):
    """ADVICE r04 item 3: torn meta or a deleted data dir must rebuild, not
    fail the read."""
    import shutil

    from imdb_mapreduce_spark.sources.silver import silver_root

    sf_dir = str(tmp_path)
    src = os.path.join(sf_dir, "documents.parquet")
    spark.range(4).select(F.col("id").alias("doc_id")).coalesce(1).write.parquet(src)

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.read.parquet(src).withColumn("x", F.col("doc_id") + 1)

    name = "torn"
    materialized(spark, sf_dir, name, "documents", {"v": 1}, build)
    assert calls["n"] == 1
    base = os.path.join(silver_root(), os.path.basename(sf_dir), name)

    # torn meta (partial JSON) → rebuild instead of JSONDecodeError
    with open(os.path.join(base, "_meta.json"), "w") as f:
        f.write('{"src": "tru')
    got = materialized(spark, sf_dir, name, "documents", {"v": 1}, build)
    assert calls["n"] == 2
    assert {r["x"] for r in got.collect()} == {1, 2, 3, 4}

    # data dir deleted under a valid meta → rebuild instead of read failure
    shutil.rmtree(os.path.join(base, "data"))
    got = materialized(spark, sf_dir, name, "documents", {"v": 1}, build)
    assert calls["n"] == 3
    assert {r["x"] for r in got.collect()} == {1, 2, 3, 4}


def test_cached_query_result_builds_once_and_invalidates(spark, tmp_path):
    """Result cache for a registry query: second call reads parquet (no
    recompute), source change rebuilds, content always equals the live
    query."""
    import shutil
    import os as _os

    from imdb_mapreduce_spark.plans.registry import all_queries
    from imdb_mapreduce_spark.sources import silver
    from imdb_mapreduce_spark.sources.silver import cached_query_result

    # private sf dir so mtime manipulation can't disturb shared testdata
    d = str(tmp_path / "sf")
    _os.makedirs(d)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        shutil.copyfile(f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet")

    name = "region_rollup"
    live = {tuple(r) for r in all_queries()[name].spark_fn(spark, d).collect()}

    got1 = {tuple(r) for r in cached_query_result(spark, d, name, ("region", "nation", "customer", "orders", "lineitem", "supplier", "part")).collect()}
    assert got1 == live

    base = _os.path.join(
        silver.silver_root(), _os.path.basename(d), f"result__{name}"
    )
    meta0 = _os.path.getmtime(_os.path.join(base, "_meta.json"))
    got2 = {tuple(r) for r in cached_query_result(spark, d, name, ("region", "nation", "customer", "orders", "lineitem", "supplier", "part")).collect()}
    assert got2 == live
    assert _os.path.getmtime(_os.path.join(base, "_meta.json")) == meta0  # no rebuild

    # touch a source -> fingerprint changes -> rebuild
    _os.utime(f"{d}/region.parquet")
    got3 = {tuple(r) for r in cached_query_result(spark, d, name, ("region", "nation", "customer", "orders", "lineitem", "supplier", "part")).collect()}
    assert got3 == live
    assert _os.path.getmtime(_os.path.join(base, "_meta.json")) > meta0  # rebuilt
