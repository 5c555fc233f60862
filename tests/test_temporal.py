"""AS-OF and band join operator semantics on hand-built cases."""

from __future__ import annotations

import datetime as dt

from imdb_mapreduce_spark.operators.temporal import asof_join, band_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_prior(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),
            (2, "u1", _ts("2024-01-01T12:00:00")),
            (3, "u2", _ts("2024-01-01T09:00:00")),  # no prior right row
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("a", "u1", _ts("2024-01-01T09:30:00")),
            ("b", "u1", _ts("2024-01-01T11:00:00")),
            ("c", "u2", _ts("2024-01-01T23:00:00")),  # after u2's event
        ],
        ["tag", "user_id", "ts"],
    )
    out = {
        r["event_id"]: r["tag_asof"]
        for r in asof_join(left, right, "user_id", "ts", ["tag"]).collect()
    }
    assert out == {1: "a", 2: "b", 3: None}


def test_asof_join_simultaneous_right_counts(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T10:00:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [("x", "u", _ts("2024-01-01T10:00:00"))], ["tag", "user_id", "ts"]
    )
    row = asof_join(left, right, "user_id", "ts", ["tag"]).collect()[0]
    assert row["tag_asof"] == "x"  # ts equality: right row is already known


def test_band_join_boundaries(spark):
    facts = spark.createDataFrame([(0.0,), (14.99,), (15.0,), (99.9,)], ["v"])
    bands = spark.createDataFrame(
        [("low", 0.0, 15.0), ("high", 15.0, 100.0)], ["band", "lo", "hi"]
    )
    got = {
        r["v"]: r["band"] for r in band_join(facts, bands, "v").collect()
    }
    # half-open [lo, hi): 15.0 belongs to 'high'
    assert got == {0.0: "low", 14.99: "low", 15.0: "high", 99.9: "high"}
