"""Oracle output-dtype hygiene sweep (VERDICT r06 item 7).

The driver's correctness hash is REPRESENTATION-sensitive: r06's only
driver-red row (`doc_rarity_scores`) had bit-equal values but DuckDB's
HUGEINT landing as pandas float64 against Spark's int64. This sweep makes
that bug class fail at registration time: every registered oracle runs
against DuckDB at sf0.001 and each output column's pandas dtype KIND must
match the kind the Spark query's schema will produce — schema only, no
Spark execution, so the whole registry scans in seconds of DuckDB time.

Two documented exemptions:
- streaming-tagged queries: their builder fns EXECUTE a stream to
  completion just to expose a schema; the full gate
  (`tools/check_correctness.py`, now dtype-aware) covers them at both
  driver SFs instead;
- an integral Spark column vs a float DuckDB column WHERE the DuckDB
  result actually contains NULLs at this SF: both engines' pandas
  rendering degrades nullable ints to float64 identically, so the driver
  hash agrees — the full gate (actual toPandas vs actual .df()) remains
  the authority for those.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from check_correctness import dtype_kind, duck_connection  # noqa: E402

SF = "/root/testdata/sf0.001"


def _spark_kind(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "datetime"
    return "object"


def test_every_oracle_output_dtype_matches_spark_schema(spark):
    from imdb_mapreduce_spark.plans.registry import all_queries

    con = duck_connection(SF)
    problems: list[str] = []
    checked = 0
    for name, q in all_queries().items():
        if q.oracle is None or "streaming" in q.tags:
            continue
        # schema only — building the DataFrame plans the query without
        # collecting it (a few builders run bounded scalar jobs, which is
        # the price of their real plan; none materialize the result)
        sdf = q.spark_fn(spark, SF)
        skinds = {f.name: _spark_kind(f.dataType) for f in sdf.schema.fields}
        odf: pd.DataFrame = con.execute(q.oracle).df()
        for col in odf.columns:
            if col not in skinds:
                problems.append(f"{name}.{col}: not in Spark schema")
                continue
            ok = dtype_kind(odf[col])
            sk = skinds[col]
            if ok == sk:
                continue
            if sk == "int" and ok == "float" and odf[col].isna().any():
                continue  # nullable-int rendering, see module docstring
            if ok == "object" and len(odf) == 0:
                continue  # empty object column carries no hash input
            problems.append(
                f"{name}.{col}: spark={sk} oracle={ok}({odf[col].dtype})"
            )
        checked += 1
    assert not problems, (
        f"oracle output dtypes diverge from Spark schema (driver hash "
        f"would fail): {problems}"
    )
    assert checked > 100  # the sweep really covered the registry


def test_sweep_catches_the_r06_hugeint_bug(spark):
    """Seeded regression: the exact doc_rarity_scores bug shape (uncast
    SUM(BIGINT) → HUGEINT → float64) must be flagged by the same kind
    comparison the sweep uses."""
    con = duck_connection(SF)
    odf = con.execute(
        "SELECT doc_id, SUM(CAST(doc_id AS BIGINT)) AS s FROM documents "
        "GROUP BY doc_id"
    ).df()
    # DuckDB types SUM(BIGINT) as HUGEINT -> pandas float64
    assert dtype_kind(odf["s"]) == "float" and not odf["s"].isna().any()
    # ... which the sweep's comparison flags against Spark's int64
    assert dtype_kind(odf["s"]) != "int"


def test_runtime_gate_fails_on_int_vs_float_kind_mismatch():
    """Negative control for the RUNTIME gate (VERDICT r07 item 7): the
    sweep above proves oracles are clean, but nothing proved
    ``check_correctness.compare`` itself trips on the r06 bug class
    end-to-end. Feed it the seeded shape — bit-equal values, Spark int64
    vs oracle float64 — and require a dtype-kind failure."""
    from check_correctness import compare

    sdf = pd.DataFrame({"doc_id": [1, 2, 3], "s": pd.array([10, 20, 30], dtype="int64")})
    odf = pd.DataFrame({"doc_id": [1, 2, 3], "s": pd.array([10.0, 20.0, 30.0], dtype="float64")})
    problems = compare("seeded_r06_bug", sdf, odf)
    assert problems and any("dtype kind mismatch" in p for p in problems), problems
    # and the control's control: identical kinds with equal values pass
    assert compare("seeded_ok", sdf, sdf.copy()) == []
