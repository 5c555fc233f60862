"""Semantic tests for the r06 session-4 operators: SemDeDup,
hard-negative mining, incremental batch-vs-corpus dedup, unigram rarity
scoring, and the foreachBatch exactly-once upsert.

Cross-engine value equality is covered by the DuckDB gate
(tools/check_correctness.py — all five are hash-green at sf0.001/0.01/0.1);
these tests pin the SEMANTIC invariants a hash can't express: the dedup
drop rule, label disjointness, verdict soundness, score reconstruction,
and replay-immunity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _embeddings(spark) -> pd.DataFrame:
    from imdb_mapreduce_spark.sources.star import load_table

    return load_table(spark, "embeddings", SF).toPandas()


def _cosine_matrix(emb: pd.DataFrame) -> np.ndarray:
    m = np.array(emb["embedding"].tolist(), dtype=np.float64)
    n = m / np.linalg.norm(m, axis=1, keepdims=True)
    return n @ n.T


def test_semdedup_drop_rule(spark):
    """Every vector appears once; no two KEPT vectors in the same cell are
    near-duplicates; every REMOVED vector has a smaller-id same-cell dup."""
    from imdb_mapreduce_spark.pipeline.similarity import (
        SEMDEDUP_TAU,
        semdedup_clusters,
    )

    res = semdedup_clusters(spark, SF).toPandas()
    emb = _embeddings(spark)
    assert sorted(res["vec_id"]) == sorted(emb["vec_id"])
    cos = _cosine_matrix(emb.sort_values("vec_id").reset_index(drop=True))
    by_id = res.set_index("vec_id")
    for cell, grp in res.groupby("cell"):
        ids = sorted(grp["vec_id"])
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                dup = cos[a, b] >= SEMDEDUP_TAU
                if dup:
                    # greedy keep-first: the larger id must be removed
                    assert not by_id.loc[b, "is_kept"]
    # every removed vector can point at a smaller same-cell dup
    for _, row in res[~res["is_kept"]].iterrows():
        ids = res[(res["cell"] == row["cell"]) & (res["vec_id"] < row["vec_id"])][
            "vec_id"
        ]
        assert any(cos[int(a), int(row["vec_id"])] >= SEMDEDUP_TAU for a in ids)
    # non-degenerate on this corpus: both verdicts occur
    assert res["is_kept"].any() and (~res["is_kept"]).any()


def test_hard_negatives_cross_label_and_match_bruteforce(spark):
    from imdb_mapreduce_spark.pipeline.similarity import (
        HARD_NEG_K,
        N_QUERIES,
        hard_negative_mining,
    )

    res = hard_negative_mining(spark, SF).toPandas()
    emb = _embeddings(spark).sort_values("vec_id").reset_index(drop=True)
    labels = emb.set_index("vec_id")["label"]
    assert set(res["query_id"]) == set(range(N_QUERIES))
    for _, r in res.iterrows():
        assert labels[r["query_id"]] != labels[r["negative_id"]]
        assert labels[r["negative_id"]] == r["neg_label"]
    cos = _cosine_matrix(emb)
    for qid, grp in res.groupby("query_id"):
        grp = grp.sort_values("rnk")
        assert list(grp["rnk"]) == list(range(1, HARD_NEG_K + 1))
        mask = (labels != labels[qid]).values
        order = sorted(
            (i for i in emb["vec_id"] if mask[i]),
            key=lambda i: (-cos[qid, i], i),
        )
        assert list(grp["negative_id"]) == order[:HARD_NEG_K]


def test_incremental_dedup_verdict_soundness(spark):
    from imdb_mapreduce_spark.pipeline.curation import (
        INCR_BATCH_MOD,
        incremental_dedup_verdicts,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    res = incremental_dedup_verdicts(spark, SF).toPandas()
    docs = load_table(spark, "documents", SF).toPandas()
    batch_ids = set(docs[docs["doc_id"] % INCR_BATCH_MOD == 0]["doc_id"])
    assert set(res["doc_id"]) == batch_ids
    norm = docs.set_index("doc_id")["text"].str.strip().str.lower()
    corpus_texts = set(norm[docs.set_index("doc_id").index % INCR_BATCH_MOD != 0])
    for _, r in res.iterrows():
        is_exact = norm[r["doc_id"]] in corpus_texts
        if r["verdict"] == "exact_dup":
            assert is_exact
        else:
            assert not is_exact
    assert set(res["verdict"]) <= {"exact_dup", "near_dup", "new"}


def test_doc_rarity_matches_pandas(spark):
    from imdb_mapreduce_spark.pipeline.text import RARITY_SCALE, doc_rarity_scores
    from imdb_mapreduce_spark.sources.star import load_table

    res = (
        doc_rarity_scores(spark, SF).toPandas().set_index("doc_id").sort_index()
    )
    docs = load_table(spark, "documents", SF).toPandas()
    types = (
        docs.assign(word=docs["text"].str.split(" ").map(lambda ws: sorted(set(ws))))
        .explode("word")[["doc_id", "word"]]
    )
    df = types.groupby("word").size()
    types["surprisal"] = types["word"].map(lambda w: RARITY_SCALE // int(df[w]))
    expect = types.groupby("doc_id").agg(
        n_types=("word", "size"), rarity_score=("surprisal", "sum")
    )
    assert res["n_types"].tolist() == expect["n_types"].tolist()
    assert res["rarity_score"].tolist() == expect["rarity_score"].tolist()


def test_foreachbatch_upsert_equals_batch_latest_and_is_replay_immune(spark):
    from imdb_mapreduce_spark.sources.star import load_table
    from imdb_mapreduce_spark.streaming.jobs import streaming_foreachbatch_upsert

    res = (
        streaming_foreachbatch_upsert(spark, SF)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    events = load_table(spark, "events", SF).toPandas()
    latest = (
        events.sort_values(["ts", "event_id"])
        .groupby("user_id")
        .last()
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert res["user_id"].tolist() == latest["user_id"].tolist()
    assert res["last_type"].tolist() == latest["event_type"].tolist()
    assert res["last_value"].tolist() == latest["value"].tolist()
    # determinism across full re-runs (fresh split, fresh replay file)
    res2 = (
        streaming_foreachbatch_upsert(spark, SF)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(res, res2)


def test_association_rules_semantics(spark):
    """Both directions of every qualifying pair; confidence in (0,1];
    spot-check confidence/lift arithmetic against a pandas recompute."""
    from imdb_mapreduce_spark.plans.graph_queries import (
        RULE_MIN_SUPPORT,
        basket_association_rules,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    res = basket_association_rules(spark, SF).toPandas()
    assert len(res) > 0
    assert ((res["confidence"] > 0) & (res["confidence"] <= 1)).all()
    assert (res["pair_support"] >= RULE_MIN_SUPPORT).all()
    li = load_table(spark, "lineitem", SF).toPandas()
    e0 = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_orders = e0["l_orderkey"].nunique()
    item = e0.groupby("l_partkey").size()
    pair_support = {}
    for _, grp in e0.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"])
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair_support[(a, b)] = pair_support.get((a, b), 0) + 1
    for _, r in res.iterrows():
        a, c = int(r["antecedent"]), int(r["consequent"])
        s12 = pair_support[(min(a, c), max(a, c))]
        assert s12 == r["pair_support"]
        assert r["ante_support"] == item[a]
        assert r["confidence"] == pytest.approx(s12 / item[a], rel=1e-12)
        assert r["lift"] == pytest.approx(
            s12 * n_orders / (item[a] * item[c]), rel=1e-12
        )
    # lift-sorted with deterministic tiebreaks
    key = list(zip(-res["lift"], res["antecedent"], res["consequent"]))
    assert key == sorted(key)


def test_embedding_dim_profile_matches_numpy(spark):
    from imdb_mapreduce_spark.pipeline.similarity import embedding_dim_profile

    res = embedding_dim_profile(spark, SF).toPandas().sort_values("dim")
    emb = _embeddings(spark)
    m = np.array(emb["embedding"].tolist(), dtype=np.float64)
    assert res["dim"].tolist() == list(range(1, m.shape[1] + 1))
    assert (res["n_vals"] == m.shape[0]).all()
    np.testing.assert_allclose(res["mean"], m.mean(axis=0), rtol=0, atol=1e-5)
    np.testing.assert_allclose(res["std"], m.std(axis=0), rtol=0, atol=1e-5)
    np.testing.assert_array_equal(res["min_val"], m.min(axis=0))
    np.testing.assert_array_equal(res["max_val"], m.max(axis=0))


def test_semdedup_k_rule_anchors_driver_sfs_and_scales():
    """The adaptive cell count must equal the oracle's fixed k at every
    driver SF (500/500/2000 vectors) and grow linearly past the target."""
    from imdb_mapreduce_spark.pipeline.similarity import (
        SEMDEDUP_K,
        SEMDEDUP_TARGET_CELL,
        semdedup_k,
    )

    for n in (500, 500, 2000):  # sf0.001 / sf0.01 / sf0.1 embeddings counts
        assert semdedup_k(n) == SEMDEDUP_K
    assert semdedup_k(None) == SEMDEDUP_K
    assert semdedup_k(20_000) == 160  # the scale10x decade
    # linear growth: cells track corpus size at fixed cell target
    assert semdedup_k(1_000_000) == 1_000_000 // SEMDEDUP_TARGET_CELL


def test_quantizer_join_path_matches_literal_path(spark):
    """The large-k join quantizer and the small-k literal-expression
    quantizer must assign identical cells (bit-identical argmin)."""
    from imdb_mapreduce_spark.pipeline.similarity import (
        _assigned_cells,
        ivf_det_pivots,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    emb = load_table(spark, "embeddings", SF)
    pivots = ivf_det_pivots(spark, SF, k=16)
    lit = {
        r["vec_id"]: r["cell"]
        for r in _assigned_cells(emb, pivots).collect()
    }
    # pad the pivot list reference so the join branch runs on the SAME 16
    # pivots: force the branch by monkeypatching the threshold
    import imdb_mapreduce_spark.pipeline.similarity as sim

    old = sim.LITERAL_QUANTIZER_MAX_K
    sim.LITERAL_QUANTIZER_MAX_K = 0
    try:
        joined = {
            r["vec_id"]: r["cell"]
            for r in _assigned_cells(emb, pivots).collect()
        }
    finally:
        sim.LITERAL_QUANTIZER_MAX_K = old
    assert lit == joined


def test_hard_negative_lsh_recall_vs_bruteforce(spark):
    """The LSH miner's negatives are a recall-bounded subset of the brute
    miner's: same regime as the ANN recall tests (near-orthogonal corpus,
    hard for sign-LSH), so assert the structural contract (cross-label,
    correct ranks, subset of candidate-reachable truth) plus a recall
    floor matched to the measured ann_lsh_topk regime."""
    from imdb_mapreduce_spark.pipeline.similarity import (
        hard_negative_lsh,
        hard_negative_mining,
    )

    brute = hard_negative_mining(spark, SF).toPandas()
    lsh = hard_negative_lsh(spark, SF).toPandas()
    emb = _embeddings(spark)
    labels = emb.set_index("vec_id")["label"]
    for _, r in lsh.iterrows():
        assert labels[r["query_id"]] != labels[r["negative_id"]]
    truth = {
        (r["query_id"], r["negative_id"]) for _, r in brute.iterrows()
    }
    got = {(r["query_id"], r["negative_id"]) for _, r in lsh.iterrows()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, recall  # 12x5 sign-LSH on near-orthogonal data


def test_two_level_quantizer_agreement_and_linear_shape(spark):
    """The hierarchical quantizer must (a) assign every vector, (b) agree
    with the exact flat argmin on a large majority of vectors, and (c)
    never assign a cell outside the pivot set."""
    from imdb_mapreduce_spark.pipeline.similarity import (
        _assigned_cells,
        assigned_cells_two_level,
        ivf_det_pivots,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    emb = load_table(spark, "embeddings", SF)
    pivots = ivf_det_pivots(spark, SF, k=16)
    flat = {
        r["vec_id"]: r["cell"] for r in _assigned_cells(emb, pivots).collect()
    }
    two = {
        r["vec_id"]: r["cell"]
        for r in assigned_cells_two_level(emb, pivots).collect()
    }
    assert set(two) == set(flat)
    cells = {c for c, _ in pivots}
    assert set(two.values()) <= cells
    agree = sum(1 for v in flat if flat[v] == two[v]) / len(flat)
    # near-orthogonal corpus = the hard routing regime; production corpora
    # (clustered) agree far higher. Floor catches structural breakage.
    assert agree >= 0.6, agree


def test_semdedup_eval_metrics_reconciles(spark):
    """The audit's counts must reconcile against a numpy recompute of the
    bounded-sample truth and the cell assignment."""
    from imdb_mapreduce_spark.pipeline.similarity import (
        SEMDEDUP_EVAL_N,
        SEMDEDUP_TAU,
        _assigned_cells,
        ivf_det_pivots,
        semdedup_eval_metrics,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    row = semdedup_eval_metrics(spark, SF).collect()[0]
    emb = _embeddings(spark)
    samp = emb[emb["vec_id"] < SEMDEDUP_EVAL_N].sort_values("vec_id")
    assert row["n_sample"] == len(samp)
    cos = _cosine_matrix(samp.reset_index(drop=True))
    sdf = load_table(spark, "embeddings", SF).filter(
        f"vec_id < {SEMDEDUP_EVAL_N}"
    )
    pivots = ivf_det_pivots(spark, SF, k=16)
    cell = {
        r["vec_id"]: r["cell"] for r in _assigned_cells(sdf, pivots).collect()
    }
    ids = samp["vec_id"].tolist()
    truth = det = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if cos[a, b] >= SEMDEDUP_TAU:
                truth += 1
                det += cell[a] == cell[b]
    assert row["n_truth_pairs"] == truth
    assert row["n_detected_pairs"] == det
    assert row["recall_scaled"] == 1_000_000 * det // max(truth, 1)


from hypothesis import given, settings
from hypothesis import strategies as st


@given(seed=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=5, deadline=None)
def test_semdedup_blocked_scorer_matches_numpy_reference(spark, seed):
    """Property: on random small corpora (clustered so dups exist), the
    distributed per-cell block scorer emits EXACTLY the ids a plain
    numpy reference computes with the same drop rule."""
    import numpy as np

    from imdb_mapreduce_spark.pipeline.similarity import (
        SEMDEDUP_TAU,
        _semdedup_removed_blocked,
    )

    rng = np.random.default_rng(seed)
    n, dim, n_cells = 60, 8, 4
    centers = rng.standard_normal((n_cells, dim)) * 0.3
    cells_idx = rng.integers(0, n_cells, size=n)
    vecs = centers[cells_idx] + rng.standard_normal((n, dim)) * 0.2
    nrm = np.sqrt((vecs.astype("float64") ** 2).sum(axis=1))

    rows = [
        (int(i), [float(x) for x in vecs[i]], int(cells_idx[i]), float(nrm[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cell int, nrm double"
    )
    got = sorted(
        r["vec_id"] for r in _semdedup_removed_blocked(df).distinct().collect()
    )

    # reference: float32-cast then float64 math, matching the Spark frame
    v32 = vecs.astype("float32").astype("float64")
    n64 = np.array([float(np.sqrt((v.astype("float64") ** 2).sum())) for v in vecs])
    want = set()
    for c in range(n_cells):
        ids = sorted(np.where(cells_idx == c)[0])
        for ai, a in enumerate(ids):
            for b in ids[ai + 1 :]:
                acc = 0.0  # dimension-major, the scorer's exact fold order
                for d in range(dim):
                    acc += v32[a][d] * v32[b][d]
                if acc / (n64[a] * n64[b]) >= SEMDEDUP_TAU:
                    want.add(int(b))
    assert got == sorted(want)
