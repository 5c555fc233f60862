"""Tripwire: the CURRENT /root/testdata must load into the engine-expected
schemas (VERDICT r03 item 3).

Round 3 shipped broken because the driver re-encoded ``events.ts``
(int64-nanos → timestamp[us]/NTZ) and nothing asserted the post-load schema:
the drift surfaced as seven scattered failures (2 driver rows, 5 pytest
items, the whole bench) instead of one named test. This file IS that named
test — if the driver re-encodes any table again, the failure starts here,
pointing at the loader that must absorb it (``sources/star.py``).

Deliberately cheap: parquet footer reads only, no data scan — safe to keep
in every pytest run at any scale factor.
"""

from __future__ import annotations

import os

import pytest

from imdb_mapreduce_spark.sources.star import TABLES, load_table

SF_DIRS = [
    "/root/testdata/sf0.001",  # pytest fixtures
    "/root/testdata/sf0.01",  # driver correctness gate
    "/root/testdata/sf0.1",  # bench
]

# The engine-facing contract AFTER load_table normalization. `events.ts`
# MUST be plain `timestamp` whatever the at-rest encoding — every window /
# session / epoch-µs plan depends on it. The NTZ date columns on orders /
# lineitem are accepted as-is: every consumer uses encoding-agnostic ops
# (date_trunc, comparisons, year()), which pytest + the driver's oracle
# gate prove green under NTZ.
EXPECTED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int"),
        ("n_name", "string"),
        ("n_regionkey", "int"),
    ],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", ("timestamp_ntz", "timestamp", "date")),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", ("timestamp_ntz", "timestamp", "date")),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),  # the r03 breakage: MUST normalize to this
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", TABLES)
def test_loaded_schema_matches_engine_contract(spark, sf_dir, table):
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} absent")
    got = load_table(spark, table, sf_dir).dtypes
    want = EXPECTED[table]
    assert len(got) == len(want), f"{table}@{sf_dir}: columns {got} != {want}"
    for (g_name, g_type), (w_name, w_type) in zip(got, want):
        assert g_name == w_name, f"{table}@{sf_dir}: column {g_name} != {w_name}"
        allowed = w_type if isinstance(w_type, tuple) else (w_type,)
        assert g_type in allowed, (
            f"{table}@{sf_dir}.{g_name}: loaded dtype {g_type!r} not in "
            f"{allowed} — driver re-encoded the parquet; absorb it in "
            f"sources/star.py"
        )


def test_streaming_events_reader_normalizes_ts(spark):
    """The stream twin of the events contract: whatever the at-rest
    encoding, read_events_stream must emit plain `timestamp` (plan-build
    only — footer sniff, no stream execution)."""
    from imdb_mapreduce_spark.streaming.jobs import read_events_stream

    stream = read_events_stream(spark, "/root/testdata/sf0.001/events.parquet")
    assert dict(stream.dtypes)["ts"] == "timestamp"
