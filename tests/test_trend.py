"""Ground-truth check for ``user_value_trend`` against numpy.polyfit.

The driver's DuckDB oracle replicates the query's formula, so a unit error
present in BOTH engines would pass the cross-engine gate (ADVICE r02: the
intercept once mixed cents and value units that way). This test anchors the
result to an independent implementation: per-user ordinary least squares via
``numpy.polyfit`` on the same (seconds-since-epoch, value) points.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from imdb_mapreduce_spark.plans.events import TREND_EPOCH
from imdb_mapreduce_spark.plans.registry import all_queries
from imdb_mapreduce_spark.sources.star import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def trend(spark):
    df = all_queries()["user_value_trend"].spark_fn(spark, SF).toPandas()
    return df.set_index("user_id")


@pytest.fixture(scope="module")
def points(spark):
    ev = load_table(spark, "events", SF).select("user_id", "ts", "value")
    pdf = ev.toPandas()
    pdf["x"] = (
        pdf["ts"].astype("datetime64[us]").astype("int64") // 1_000_000
        - TREND_EPOCH
    )
    return pdf


def test_slope_and_intercept_match_polyfit(trend, points):
    checked = 0
    for user_id, grp in points.groupby("user_id"):
        if len(grp) < 3 or grp["x"].nunique() < 2:
            continue
        slope_sec, intercept = np.polyfit(
            grp["x"].to_numpy(dtype=float), grp["value"].to_numpy(dtype=float), 1
        )
        row = trend.loc[user_id]
        assert row["slope_per_hour"] == pytest.approx(
            slope_sec * 3600.0, rel=1e-6, abs=1e-9
        ), f"slope mismatch for user {user_id}"
        assert row["intercept"] == pytest.approx(
            intercept, rel=1e-6, abs=1e-6
        ), f"intercept mismatch for user {user_id}"
        checked += 1
    assert checked >= 10  # sf0.001 has ~15 users with ≥3 events


def test_intercept_magnitude_is_in_value_units(trend, points):
    """The r02 bug made the intercept ~100× the value scale for trending
    users; the mean intercept must sit near the mean event value."""
    mean_value = points["value"].mean()
    mean_intercept = trend["intercept"].mean()
    assert abs(mean_intercept - mean_value) < mean_value  # same order
