"""The `synthdocs` Python DataSource: determinism, partition-invariance,
schema compatibility with the `documents` operators."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def registered(spark):
    from imdb_mapreduce_spark.sources.synthdocs import SynthDocsDataSource

    spark.dataSource.register(SynthDocsDataSource)
    return spark


def _read(spark, n=200, seed=7, partitions=4):
    return (
        spark.read.format("synthdocs")
        .option("n_docs", n)
        .option("seed", seed)
        .option("partitions", partitions)
        .load()
    )


def test_row_count_schema_and_parallelism(registered):
    df = _read(registered, n=200, partitions=4)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(200))
    for r in rows[:20]:
        assert r["n_chars"] == len(r["text"])
        assert r["lang"] in ("en", "de", "fr", "es", "zh")


def test_partition_count_does_not_change_content(registered):
    a = {r["doc_id"]: r["text"] for r in _read(registered, partitions=1).collect()}
    b = {r["doc_id"]: r["text"] for r in _read(registered, partitions=7).collect()}
    assert a == b


def test_seed_changes_content_rereads_do_not(registered):
    a = {r["doc_id"]: r["text"] for r in _read(registered, seed=7).collect()}
    a2 = {r["doc_id"]: r["text"] for r in _read(registered, seed=7).collect()}
    c = {r["doc_id"]: r["text"] for r in _read(registered, seed=8).collect()}
    assert a == a2
    assert a != c


def test_documents_operators_run_on_generated_corpus(registered):
    """The generated schema is drop-in for the documents table: run the
    exact-dedup groupBy and the shingle explode over it."""
    from pyspark.sql import functions as F

    from imdb_mapreduce_spark.pipeline.dedup import exploded_shingles, fingerprint

    df = _read(registered, n=300)
    groups = df.groupBy(fingerprint().alias("fp")).agg(
        F.count("*").alias("n_docs")
    )
    assert groups.agg(F.sum("n_docs")).collect()[0][0] == 300
    sh = exploded_shingles(df)
    assert sh.count() > 0


def test_stream_read_equals_batch_read(registered):
    """readStream over synthdocs drains the bounded corpus in micro-batches
    and the union equals the batch read exactly (same pure generator)."""
    import tempfile

    spark = registered
    stream = (
        spark.readStream.format("synthdocs")
        .option("n_docs", 300)
        .option("seed", 7)
        .option("batch_rows", 100)
        .load()
    )
    name = "synthdocs_stream_sink"
    with tempfile.TemporaryDirectory() as ckpt:
        # availableNow only drains the one prefetched micro-batch for
        # simple stream readers; poll a continuous trigger until the
        # bounded source is exhausted instead.
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        import time

        deadline = time.time() + 120
        while time.time() < deadline and spark.table(name).count() < 300:
            time.sleep(0.5)
        q.stop()
    got = {r["doc_id"]: r["text"] for r in spark.table(name).collect()}
    want = {r["doc_id"]: r["text"] for r in _read(spark, n=300).collect()}
    assert got == want
