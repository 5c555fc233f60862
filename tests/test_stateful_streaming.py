"""applyInPandasWithState: cross-batch state must converge to the batch
answer when the stream drains."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from imdb_mapreduce_spark.sources.star import load_table
from imdb_mapreduce_spark.streaming.jobs import read_events_stream
from imdb_mapreduce_spark.streaming.stateful import running_user_stats

SF = "/root/testdata/sf0.001"


def test_stateful_user_stats_converge_to_batch(spark):
    stream = read_events_stream(spark, f"{SF}/events.parquet")
    result = running_user_stats(stream)

    name = f"stateful_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # update-mode memory sink appends one row per (batch, key) — the LAST
    # row per key is the final state.
    import pandas as pd

    emitted = spark.table(name).toPandas()
    final = emitted.groupby("user_id").last()

    batch = (
        load_table(spark, "events", SF)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    for uid, row in batch.iterrows():
        got = final.loc[uid]
        assert got["n_events"] == row["n_events"]
        assert abs(got["total_value"] - row["total_value"]) < 1e-6
        assert got["max_value"] == row["max_value"]


def test_twsip_totals_equal_batch(spark):
    """transformWithStateInPandas (Spark 4 typed-state API): final per-user
    totals must equal the batch DECIMAL aggregate exactly. Skips where the
    TWS state server's protobuf dependency is absent (this container)."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable — TWS state server needs it")

    from pyspark.sql import functions as F

    from imdb_mapreduce_spark.sources.star import load_table
    from imdb_mapreduce_spark.streaming.jobs import (
        streaming_user_lifetime_totals,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_events"], r["total_cents"])
        for r in streaming_user_lifetime_totals(spark, sf).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["total_cents"])
        for r in load_table(spark, "events", sf)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("total_cents"),
        )
        .collect()
    }
    assert got == want
