"""Pipeline-operator invariants that the DuckDB oracle can't check:
MinHash/LSH recall vs exact Jaccard, SimHash properties, LSH-ANN recall
vs brute force, multimodal stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from imdb_mapreduce_spark.pipeline.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_sig,
    simhash_near_pairs,
)
from imdb_mapreduce_spark.pipeline.multimodal import (
    decode_image,
    fake_decode_meta,
    media_metadata,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("today", "tomorrow")),  # near dup
        (4, "completely different words about spark query engines at scale"),
        (5, "another unrelated document mentioning join order and hash tables"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_identical_docs_identical_sigs(near_dup_docs):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(near_dup_docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_lsh_finds_near_dups_not_far_pairs(near_dup_docs):
    sigs = minhash_signatures(near_dup_docs)
    pairs = {
        (r["doc1"], r["doc2"]) for r in lsh_candidate_pairs(sigs).collect()
    }
    assert (1, 2) in pairs  # exact dup always collides
    assert (1, 3) in pairs  # near dup: differs in 1 of 13 words
    assert (4, 5) not in pairs  # unrelated docs shouldn't bucket together


def test_simhash_hamming_properties(near_dup_docs):
    sigs = simhash_sig(near_dup_docs)
    vals = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert vals[1] == vals[2]
    ham_near = bin(vals[1] ^ vals[3]).count("1")
    ham_far = bin(vals[1] ^ vals[4]).count("1")
    assert ham_near < ham_far
    pairs = {(r["doc1"], r["doc2"]) for r in simhash_near_pairs(sigs, 10).collect()}
    assert (1, 2) in pairs


def test_ann_lsh_recall_vs_bruteforce(spark):
    from imdb_mapreduce_spark.pipeline.similarity import (
        ann_cosine_topk,
        ann_lsh_topk,
    )

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_cosine_topk(spark, SF).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in ann_lsh_topk(spark, SF).collect()
    }
    # Tuned knobs (12 tables × 5 planes, similarity.LSH_TABLES/LSH_PLANES):
    # measured recall 0.76 at sf0.001 / 0.72 at sf0.01 on this corpus's
    # near-orthogonal neighbors (top-5 cosine 0.26-0.49), scoring ~1/3 of
    # the corpus per query. Deterministic (seeded planes, fixed data).
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.6


def test_ann_ivf_recall_vs_bruteforce(spark):
    from imdb_mapreduce_spark.pipeline.similarity import (
        ann_cosine_topk,
        ann_ivf_topk,
    )

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_cosine_topk(spark, SF).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"]) for r in ann_ivf_topk(spark, SF).collect()
    }
    assert len(ivf) > 0
    assert len(ivf & exact) > 0  # real neighbors survive cell restriction


def test_ann_ivf_full_probe_equals_brute_force(spark):
    """Registry-delegation evidence (r06, VERDICT r05 item 3): the KMeans
    IVF library path with nprobe = k (every cell probed) must equal the
    brute-force cosine top-k EXACTLY — pairs, scores, and ranks. With the
    cell restriction removed, any residual difference would be a bug in
    the probe/scoring/ranking machinery, which is the part the registered
    (oracle-backed) ann_ivf_det_topk shares with this variant."""
    from imdb_mapreduce_spark.pipeline.similarity import (
        ann_cosine_topk,
        ann_ivf_topk,
    )

    exact = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rnk"])
        for r in ann_cosine_topk(spark, SF).collect()
    }
    full = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rnk"])
        for r in ann_ivf_topk(spark, SF, nprobe=8).collect()
    }
    assert full == exact


def test_cosine_pairs_arrow_rejects_null_and_ragged(spark):
    """ADVICE r05 item 5: a null or ragged embedding must fail loudly at
    the batch boundary, not silently misalign every pair after it in the
    reshape."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import PythonException

    from imdb_mapreduce_spark.pipeline.similarity import cosine_pairs_arrow

    schema = (
        "vec1 long, vec2 long, e1 array<float>, e2 array<float>, "
        "n1 double, n2 double"
    )
    ok = [(1, 2, [1.0, 0.0], [0.0, 1.0], 1.0, 1.0)]
    assert cosine_pairs_arrow(spark.createDataFrame(ok, schema)).collect()[0][
        "cosine"
    ] == 0.0

    ragged = ok + [(3, 4, [1.0, 0.0, 0.0], [0.0, 1.0], 1.0, 1.0)]
    with _pytest.raises(PythonException, match="ragged embeddings"):
        cosine_pairs_arrow(spark.createDataFrame(ragged, schema)).collect()

    withnull = ok + [(5, 6, None, [0.0, 1.0], 1.0, 1.0)]
    with _pytest.raises(PythonException, match="null embedding"):
        cosine_pairs_arrow(spark.createDataFrame(withnull, schema)).collect()


def test_media_stub_and_fake_decode(spark):
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:  # the import gate must fail loudly, not silently
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG")
    assert fake_decode_meta(b"abcd") == (4, 5, 5, "png")
    docs = spark.createDataFrame([(1, "hello"), (2, "worlds!")], ["doc_id", "text"])
    meta = {r["doc_id"]: r for r in media_metadata(docs).collect()}
    assert meta[1]["n_bytes"] == 5 and meta[1]["format"] == "jpeg"
    assert meta[2]["n_bytes"] == 7
    assert meta[2]["width"] == 7 % 640 + 1


def test_real_image_decode_with_pil(spark):
    """The PIL decode path end-to-end (skips in this codec-less container;
    runs wherever Pillow is installed): real PNG bytes through the same
    mapInPandas plumbing as the fake path, checking actual dimensions."""
    Image = pytest.importorskip(
        "PIL.Image", reason="container has no image codecs"
    )
    import io

    payloads = []
    for i, (w, h) in enumerate([(3, 2), (5, 5), (2, 7)], start=1):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (i, i, i)).save(buf, format="PNG")
        payloads.append((i, bytearray(buf.getvalue())))
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in media_metadata(df, real=True).collect()}
    assert out[1]["width"] == 3 and out[1]["height"] == 2
    assert out[1]["format"] == "png"
    assert out[3]["width"] == 2 and out[3]["height"] == 7
    assert all(out[i]["n_bytes"] > 0 for i in out)


def test_embedding_lsh_dups_agrees_with_label_blocking(spark):
    # Bucket-blocking (the scale path) vs label-blocking (the oracle-simple
    # demo): identical exact-cosine verification, different candidate
    # generation. On the overlap the cosines must be bit-identical; of the
    # same-label pairs above the shared threshold, bucket-blocking must
    # recover a solid majority (measured 0.72 at sf0.001, deterministic).
    from imdb_mapreduce_spark.pipeline.similarity import (
        DUP_COS,
        embedding_label_dups,
        embedding_lsh_dups,
    )

    label = {(r.vec1, r.vec2): r.cosine for r in embedding_label_dups(spark, SF).collect()}
    lsh = {(r.vec1, r.vec2): r.cosine for r in embedding_lsh_dups(spark, SF).collect()}
    label_hi = {k for k, c in label.items() if c >= DUP_COS}
    found = label_hi & set(lsh)
    assert len(found) / len(label_hi) >= 0.6
    assert all(label[k] == lsh[k] for k in found)  # same verify, bit-exact


def test_ann_lsh_multiprobe_raises_recall(spark):
    # Hamming-1 multi-probe on the query side only: strictly more
    # candidates, strictly better recall (measured 0.72 -> 1.00 at sf0.01,
    # 0.76 -> expected >= 0.9 here; deterministic seeded planes).
    from imdb_mapreduce_spark.pipeline.similarity import (
        ann_cosine_topk,
        ann_lsh_topk,
    )

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_cosine_topk(spark, SF).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"]) for r in ann_lsh_topk(spark, SF).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_topk(spark, SF, multiprobe=5).collect()
    }
    assert len(multi & exact) / len(exact) >= 0.9
    assert len(multi & exact) >= len(single & exact)


def test_ann_ivf_nprobe_raises_recall(spark):
    # probing the query's N nearest cells (exact centroid distances) is
    # monotone in recall: measured 0.30 / 0.50 / 0.62 at sf0.01 for
    # nprobe 1/2/3 (deterministic: seeded k-means, fixed data).
    from imdb_mapreduce_spark.pipeline.similarity import (
        ann_cosine_topk,
        ann_ivf_topk,
    )

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_cosine_topk(spark, SF).collect()
    }
    r1 = {
        (r["query_id"], r["neighbor_id"]) for r in ann_ivf_topk(spark, SF).collect()
    }
    r3 = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_ivf_topk(spark, SF, nprobe=3).collect()
    }
    assert len(r3 & exact) >= len(r1 & exact)
    assert len(r3 & exact) / len(exact) >= 0.4


def test_arrow_bucket_fast_path_matches_expression_path(spark):
    # The numpy-matmul bucket builder must agree with the codegen
    # expression path. Agreement is exact on this corpus (a disagreement
    # requires a projection within float rounding of zero — probability
    # ~1e-8 per projection); both paths are deterministic, so this is a
    # stable equality, not a flaky threshold.
    from pyspark.sql import functions as FN

    from imdb_mapreduce_spark.pipeline.similarity import (
        random_hyperplane_buckets,
        random_hyperplane_buckets_arrow,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    emb = load_table(spark, "embeddings", SF)
    expr_b = {
        (r["vec_id"], r["table"]): r["bucket"]
        for r in random_hyperplane_buckets(emb).collect()
    }
    arrow_b = {
        (r["vec_id"], r["table"]): r["bucket"]
        for r in random_hyperplane_buckets_arrow(emb).collect()
    }
    assert expr_b == arrow_b
    # exact mode is left-fold-identical BY CONSTRUCTION (dimension-major
    # accumulation), not just on this corpus — the mode the oracle-gated
    # ann_lsh_topk runs
    exact_b = {
        (r["vec_id"], r["table"]): r["bucket"]
        for r in random_hyperplane_buckets_arrow(emb, exact=True).collect()
    }
    assert exact_b == expr_b


def test_ann_ivf_is_exact_within_probed_cells(spark):
    """The sharp IVF invariant (this is the query's real contract, far
    stronger than nonzero recall): for every query, the IVF top-k equals
    the EXACT cosine top-k restricted to vectors in the probed cells —
    the approximation lives entirely in the cell restriction, never in
    the scoring or ranking."""
    import numpy as np

    from imdb_mapreduce_spark.pipeline.similarity import (
        N_QUERIES,
        TOP_K,
        _ivf_index_dir,
        ann_ivf_topk,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    idx = _ivf_index_dir(spark, SF, k=8, seed=42)
    centers = {
        r["cell"]: np.array(r["center"], dtype="float64")
        for r in spark.read.parquet(f"{idx}/centroids").collect()
    }
    cell_of = {
        r["vec_id"]: r["cell"] for r in spark.read.parquet(f"{idx}/cells").collect()
    }
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype="float64")
        for r in load_table(spark, "embeddings", SF).collect()
    }

    expected = set()
    for qid in range(N_QUERIES):
        if qid not in vecs:
            continue
        qe = vecs[qid]
        probe = min(
            centers, key=lambda c: (float(np.sum((qe - centers[c]) ** 2)), c)
        )
        cands = [v for v, c in cell_of.items() if c == probe and v != qid]
        scored = sorted(
            cands,
            key=lambda v: (
                -float(
                    np.dot(qe, vecs[v])
                    / (np.linalg.norm(qe) * np.linalg.norm(vecs[v]))
                ),
                v,
            ),
        )
        expected |= {(qid, v) for v in scored[:TOP_K]}

    got = {
        (r["query_id"], r["neighbor_id"]) for r in ann_ivf_topk(spark, SF).collect()
    }
    assert got == expected


def test_arrow_minhash_matches_expression_path(spark):
    """The Arrow signature builder must equal the JVM expression build
    bit-for-bit on real data (same md5, same exact int64 arithmetic) —
    the parity that lets the oracle-gated minhash_lsh_dups run the fast
    path."""
    from imdb_mapreduce_spark.pipeline.dedup import (
        MINHASH_PERMS,
        minhash_signatures_arrow,
        minhash_signatures_md5,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    docs = load_table(spark, "documents", SF)
    cols = [f"h{i}" for i in range(MINHASH_PERMS)]
    exp = {r["doc_id"]: tuple(r[c] for c in cols) for r in minhash_signatures_md5(docs).collect()}
    arr = {r["doc_id"]: tuple(r[c] for c in cols) for r in minhash_signatures_arrow(docs).collect()}
    assert arr == exp


def test_arrow_simhash_matches_expression_path(spark):
    from imdb_mapreduce_spark.pipeline.dedup import simhash_sig, simhash_sig_arrow
    from imdb_mapreduce_spark.sources.star import load_table

    docs = load_table(spark, "documents", SF)
    exp = {r["doc_id"]: r["simhash"] for r in simhash_sig(docs).collect()}
    arr = {r["doc_id"]: r["simhash"] for r in simhash_sig_arrow(docs).collect()}
    assert arr == exp


def test_arrow_builders_match_expressions_on_random_text(spark):
    """Parity on adversarial random text, not just the fixture corpus:
    unicode-ish tokens, repeated tokens, single-token docs, long docs —
    the Arrow and expression builders must agree bit-for-bit on all of
    them (md5 + exact integer arithmetic leaves no rounding to hide in).
    Deterministic cases (no RNG) so a failure is reproducible."""
    from imdb_mapreduce_spark.pipeline.dedup import (
        MINHASH_PERMS,
        minhash_signatures_arrow,
        minhash_signatures_md5,
        simhash_sig,
        simhash_sig_arrow,
    )

    cases = [
        "a",
        "a a a a a a a a",
        "x y",
        " ".join(f"w{i}" for i in range(200)),
        " ".join(f"w{i % 7}" for i in range(64)),
        "Ünïcode tökens mixed with ascii and CAPS and 123 456",
        "the quick brown fox jumps over the lazy dog",
        " ".join(str(i * 37 % 100) for i in range(50)),
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], ["doc_id", "text"]
    )
    cols = [f"h{i}" for i in range(MINHASH_PERMS)]
    exp_m = {r["doc_id"]: tuple(r[c] for c in cols) for r in minhash_signatures_md5(docs).collect()}
    arr_m = {r["doc_id"]: tuple(r[c] for c in cols) for r in minhash_signatures_arrow(docs).collect()}
    assert arr_m == exp_m
    exp_s = {r["doc_id"]: r["simhash"] for r in simhash_sig(docs).collect()}
    arr_s = {r["doc_id"]: r["simhash"] for r in simhash_sig_arrow(docs).collect()}
    assert arr_s == exp_s


def test_ann_ivf_det_properties(spark):
    """The deterministic-pivot IVF (hash-verifiable sibling of ann_ivf_topk):
    cell assignment must be the true argmin over the md5-ranked pivots, and
    real neighbors must survive the cell restriction."""
    from imdb_mapreduce_spark.pipeline.similarity import (
        IVF_DET_K,
        TOP_K,
        ann_cosine_topk,
        ann_ivf_det_topk,
        ivf_det_pivots,
        _ivf_det_ranked,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    pivots = ivf_det_pivots(spark, SF)
    assert len(pivots) == IVF_DET_K
    assert [c for c, _ in pivots] == list(range(IVF_DET_K))

    # argmin property, re-derived in plain Python with a left fold
    emb = load_table(spark, "embeddings", SF)
    ranked = _ivf_det_ranked(pivots)
    got = {
        r["vec_id"]: r["cell"]
        for r in emb.select("vec_id", ranked[0]["cell"].alias("cell")).collect()
    }

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (float(x) - y) * (float(x) - y)
        return acc

    for r in emb.select("vec_id", "embedding").collect():
        best = min((d2(r["embedding"], vec), cell) for cell, vec in pivots)
        assert got[r["vec_id"]] == best[1], r["vec_id"]

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_cosine_topk(spark, SF).collect()
    }
    det = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_ivf_det_topk(spark, SF).collect()
    }
    assert len(det) > 0
    assert len(det & exact) > 0  # real neighbors survive cell restriction
    # ranks are 1..TOP_K per query, unique
    rows = ann_ivf_det_topk(spark, SF).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
    for q, rnks in per_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= TOP_K


def test_random_projection_jl_distortion(spark):
    """JL guarantee: pairwise distances survive the 64d->16d projection
    within bounded distortion. With d=16 the bound is loose; assert every
    sampled pair's distance ratio stays in a generous band and the mean
    lands near 1 (unbiased)."""
    import numpy as np

    from imdb_mapreduce_spark.pipeline.similarity import (
        PROJ_DIM,
        embedding_random_projection,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    rows = embedding_random_projection(spark, SF).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype="float64")
        for r in load_table(spark, "embeddings", SF).collect()
    }
    proj = {
        r["vec_id"]: np.array([float(x) for x in r["proj"].split(",")])
        for r in rows
    }
    assert all(len(p) == PROJ_DIM for p in proj.values())
    ids = sorted(proj)[:30]
    ratios = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            do = np.linalg.norm(emb[a] - emb[b])
            dp = np.linalg.norm(proj[a] - proj[b])
            if do > 0:
                ratios.append(dp / do)
    ratios = np.array(ratios)
    assert (ratios > 0.3).all() and (ratios < 2.2).all()
    assert 0.8 <= ratios.mean() <= 1.2
    # norm audit columns agree with the rendered vector (rounding aside)
    for r in rows[:20]:
        assert abs(r["proj_norm"] - np.linalg.norm(proj[r["vec_id"]])) < 1e-4
        assert r["norm_ratio"] == r["proj_norm"] / r["orig_norm"]


def test_media_phash_banding_is_exact_vs_quadratic(spark, tmp_path):
    """The 4x16 banding must return EXACTLY the pairs a quadratic hamming
    scan would at threshold 2 (pigeonhole), and byte-identical payloads
    must pair at hamming 0."""
    import itertools

    from imdb_mapreduce_spark.pipeline.multimodal import (
        PHASH_HAM_MAX,
        media_phash_dedup,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    sf = SF  # real corpus slice
    pairs = {
        (r["doc1"], r["doc2"]): r["hamming"]
        for r in media_phash_dedup(spark, sf).collect()
    }
    assert all(h <= PHASH_HAM_MAX for h in pairs.values())
    # quadratic reference over the same phashes (recompute via the query's
    # own per-doc hash by grouping pairs is circular — rebuild from bands
    # source instead: derive phash per doc from any pair row is not
    # possible, so recompute histograms in python)
    import numpy as np

    docs = load_table(spark, "documents", sf).select("doc_id", "text").collect()
    hists = {}
    for r in docs:
        b = np.frombuffer(r["text"].encode("utf-8"), dtype=np.uint8) % 64
        hists[r["doc_id"]] = np.bincount(b, minlength=64).astype("int64")
    corpus = sum(hists.values())
    ct = int(corpus.sum())
    phash = {}
    for d, h in hists.items():
        total = int(h.sum())
        bits = 0
        for i in range(63):
            if int(h[i]) * ct > int(corpus[i]) * total:
                bits |= 1 << i
        phash[d] = bits
    expect = {}
    for a, b in itertools.combinations(sorted(phash), 2):
        ham = bin(phash[a] ^ phash[b]).count("1")
        if ham <= PHASH_HAM_MAX:
            expect[(a, b)] = ham
    assert pairs == expect


def test_verify_pairs_jaccard_fallback_matches_broadcast(spark, monkeypatch):
    """The r09 candidate-broadcast guard (ADVICE r08): past
    VERIFY_BROADCAST_MAX_PAIRS the verify join falls back to a
    shuffled-hash build on the pair side. Both branches must produce
    identical (doc1, doc2, shared, jaccard) rows — the threshold is a
    plan knob, never a semantic one."""
    from imdb_mapreduce_spark.pipeline import dedup
    from imdb_mapreduce_spark.sources.star import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    sigs = dedup.minhash_signatures_arrow(docs)
    cands = dedup.lsh_candidate_pairs_md5(sigs)

    def rows(df):
        return {
            (r["doc1"], r["doc2"], r["shared"], r["jaccard"])
            for r in df.collect()
        }

    broadcast_rows = rows(dedup.verify_pairs_jaccard(cands, docs))
    monkeypatch.setattr(dedup, "VERIFY_BROADCAST_MAX_PAIRS", 0)
    fallback_rows = rows(dedup.verify_pairs_jaccard(cands, docs))
    assert broadcast_rows and fallback_rows == broadcast_rows


def test_verify_pairs_jaccard_branch_plans(spark, monkeypatch):
    """Plan-level pin for the r09 guard: under the bound the candidate
    side broadcasts (BroadcastExchange present); past it the join runs
    shuffled (no broadcast of the pair relation) — so a regression that
    silently re-broadcasts unbounded candidates turns red here."""
    import io
    from contextlib import redirect_stdout

    from imdb_mapreduce_spark.pipeline import dedup
    from imdb_mapreduce_spark.sources.star import load_table

    def plan(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    cands = dedup.lsh_candidate_pairs_md5(dedup.minhash_signatures_arrow(docs))

    p_broadcast = plan(dedup.verify_pairs_jaccard(cands, docs))
    assert "BroadcastHashJoin" in p_broadcast

    monkeypatch.setattr(dedup, "VERIFY_BROADCAST_MAX_PAIRS", 0)
    p_fallback = plan(dedup.verify_pairs_jaccard(cands, docs))
    assert "BroadcastHashJoin" not in p_fallback
    assert "ShuffledHashJoin" in p_fallback


def test_dot_unrolled_parse_matches_column_loop(spark):
    """Bit-parity pin for the r16 construction change: `_dot_unrolled`
    now renders its left-associated sum as ONE parsed (and memoized)
    SQL string instead of a ~4·dim py4j Column-arithmetic loop. The
    executed arithmetic must be the identical IEEE sequence — this test
    rebuilds the OLD loop inline and asserts bitwise-equal doubles on
    real embeddings (exact ==, no tolerance), plus memo identity."""
    from imdb_mapreduce_spark.pipeline.similarity import (
        _dot_unrolled,
        _expr_memo,
    )
    from imdb_mapreduce_spark.sources.star import load_table

    emb = load_table(spark, "embeddings", SF).limit(50)

    def old_loop(a: str, b: str, dim: int = 64):
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            acc = acc + (
                F.element_at(F.col(a), i).cast("double")
                * F.element_at(F.col(b), i).cast("double")
            )
        return acc

    rows = emb.select(
        "vec_id",
        _dot_unrolled("embedding", "embedding").alias("new"),
        old_loop("embedding", "embedding").alias("old"),
    ).collect()
    assert rows
    for r in rows:
        assert r["new"] == r["old"], r["vec_id"]  # bitwise, not approx

    # the memo returns the SAME Column object for the same SQL text
    c1 = _expr_memo("CAST(0 AS DOUBLE) + 1.0")
    c2 = _expr_memo("CAST(0 AS DOUBLE) + 1.0")
    assert c1 is c2
