"""Curation operators: decontamination, deterministic sampling, CDC upsert.

Beyond the DuckDB oracle (which pins cross-engine values), these pin the
SEMANTICS — membership laws, exact per-group counts, merge laws — against
independently-computed Python expectations, plus the plan shapes the 100 TB
posture claims (broadcast benchmark side, WindowGroupLimit pushdown).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from imdb_mapreduce_spark.pipeline.curation import (
    BENCH_MOD,
    DEFAULT_RATE,
    PER_GROUP_N,
    STRATA_RATES,
    benchmark_decontam,
    cdc_orders_upsert,
    sample_n_per_group,
    stratified_sample_hash,
)
from imdb_mapreduce_spark.sources.star import load_table

SF = "/root/testdata/sf0.001"


def _py_bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:7], 16) % 100


def test_decontam_flags_only_corpus_docs_with_real_overlap(spark):
    rows = benchmark_decontam(spark, SF).collect()
    assert len(rows) > 0  # the synthetic corpus does collide at 3-grams
    for r in rows:
        assert r["doc_id"] % BENCH_MOD != 0  # benchmark never flags itself
        assert r["n_overlap_shingles"] >= 1
        assert r["n_benchmark_docs"] >= 1


def test_decontam_overlap_verified_against_python(spark):
    # Recompute one flagged doc's overlap exactly: distinct 3-grams shared
    # with the distinct 3-gram set of ALL benchmark docs.
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, "documents", SF).collect()
    }

    def grams(toks):
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    bench = {}
    for d, t in docs.items():
        if d % BENCH_MOD == 0:
            bench[d] = grams(t)
    bench_union = set().union(*bench.values())
    got = {r["doc_id"]: r for r in benchmark_decontam(spark, SF).collect()}
    # full-corpus law, not a sampled one: EVERY corpus doc's expected
    # overlap matches, and non-flagged docs have zero overlap
    for d, t in docs.items():
        if d % BENCH_MOD == 0:
            continue
        overlap = grams(t) & bench_union
        if d in got:
            assert got[d]["n_overlap_shingles"] == len(overlap)
            assert got[d]["n_benchmark_docs"] == sum(
                1 for g in bench.values() if grams(t) & g
            )
        else:
            assert not overlap


def test_stratified_sample_membership_is_exact(spark):
    docs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, "documents", SF).collect()
    }
    expected = {
        d
        for d, lang in docs.items()
        if _py_bucket(d) < STRATA_RATES.get(lang, DEFAULT_RATE)
    }
    got = {r["doc_id"] for r in stratified_sample_hash(spark, SF).collect()}
    assert got == expected  # bit-exact membership, no RNG anywhere


def test_sample_n_per_group_exact_counts_and_ranks(spark):
    rows = sample_n_per_group(spark, SF).collect()
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["sample_rank"])
    sizes = {
        r["lang"]: r["n"]
        for r in load_table(spark, "documents", SF)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(by_lang) == set(sizes)
    for lang, ranks in by_lang.items():
        want = min(PER_GROUP_N, sizes[lang])
        assert sorted(ranks) == list(range(1, want + 1))


def test_cdc_upsert_merge_laws(spark):
    orders = load_table(spark, "orders", SF)
    base = {
        r["o_orderkey"]: r
        for r in orders.select(
            "o_orderkey",
            "o_orderstatus",
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        ).collect()
    }
    merged = {r["o_orderkey"]: r for r in cdc_orders_upsert(spark, SF).collect()}
    assert set(merged) == set(base)  # upsert never drops or invents keys
    for k, b in base.items():
        m = merged[k]
        if k % 10 == 0:
            assert m["src_seq"] == 2 and m["o_orderstatus"] == "U"
            assert m["price_cents"] == b["cents"] * 11 // 10
        else:
            assert m["src_seq"] == 1
            assert m["o_orderstatus"] == b["o_orderstatus"]
            assert m["price_cents"] == b["cents"]


def test_corpus_mix_allocation_invariants(spark):
    """Largest-remainder apportionment laws: allocations are integers that
    sum EXACTLY to the budget, each within 1 of the exact proportional
    share, ordered consistently with corpus mass."""
    from imdb_mapreduce_spark.pipeline.curation import (
        MIX_BUDGET,
        corpus_mix_allocation,
    )

    rows = corpus_mix_allocation(spark, SF).collect()
    total = sum(r["total_tokens"] for r in rows)
    assert sum(r["alloc_tokens"] for r in rows) == MIX_BUDGET
    for r in rows:
        exact = MIX_BUDGET * r["total_tokens"] / total
        assert exact - 1 < r["alloc_tokens"] < exact + 1


def _explain(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_curation_plan_shapes(spark):
    # benchmark side broadcasts (corpus never shuffles for the join) …
    plan = _explain(benchmark_decontam(spark, SF))
    assert "BroadcastHashJoin" in plan
    # … and the rank<=N filter pushes into the window as a group limit
    # (map-side top-N heap, full groups never materialized)
    plan2 = _explain(sample_n_per_group(spark, SF))
    assert "WindowGroupLimit" in plan2


def test_decontam_shuffle_fallback_when_bench_too_big(spark, monkeypatch):
    """ADVICE r04 item 4: a corpus-proportional benchmark side must not
    broadcast. Force the gate shut and assert the plan switches to a
    shuffled hash join with identical results."""
    from imdb_mapreduce_spark.pipeline import curation

    broadcast_rows = {
        (r["doc_id"], r["n_overlap_shingles"], r["n_benchmark_docs"])
        for r in benchmark_decontam(spark, SF).collect()
    }
    monkeypatch.setattr(curation, "BENCH_BROADCAST_MAX_SHINGLES", 0)
    gated = benchmark_decontam(spark, SF)
    plan = _explain(gated)
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan
    gated_rows = {
        (r["doc_id"], r["n_overlap_shingles"], r["n_benchmark_docs"])
        for r in gated.collect()
    }
    assert gated_rows == broadcast_rows


def test_snapshot_diff_partitions_and_conserves(spark):
    """Diff classes must reconcile: |v2| = |v1| - removed + added, and
    every 100th key is removed, every surviving 10th changed."""
    from imdb_mapreduce_spark.pipeline.curation import snapshot_diff
    from imdb_mapreduce_spark.sources.star import load_table

    sf = "/root/testdata/sf0.001"
    rows = snapshot_diff(spark, sf).collect()
    by = {}
    for r in rows:
        by.setdefault(r["change_type"], []).append(r)
    keys = [
        r["o_orderkey"]
        for r in load_table(spark, "orders", sf).select("o_orderkey").collect()
    ]
    max_key = max(keys)
    n_removed = len(by.get("removed", []))
    n_added = len(by.get("added", []))
    # reconcile each class against an INDEPENDENT count from the source
    # keys, so a diff that drops/duplicates rows fails here
    assert n_removed == sum(1 for k in keys if k % 100 == 0)
    assert all(r["o_orderkey"] % 100 == 0 for r in by.get("removed", []))
    assert n_added == sum(1 for k in keys if k % 250 == 0)
    expected_changed = sum(1 for k in keys if k % 10 == 0 and k % 100 != 0)
    assert len(by.get("changed", [])) == expected_changed
    for r in by.get("changed", []):
        assert r["o_orderkey"] % 10 == 0 and r["o_orderkey"] % 100 != 0
        assert r["new_price_cents"] == r["old_price_cents"] * 11 // 10
        assert r["new_status"] == "U"
    # clone keys are offset by max(o_orderkey)+1 — fresh at any scale
    assert {r["o_orderkey"] - (max_key + 1) for r in by.get("added", [])} == {
        k for k in keys if k % 250 == 0
    }
    for r in by.get("added", []):
        assert r["old_price_cents"] == -1 and r["old_status"] == ""
