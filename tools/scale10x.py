"""Fourth scaling decade for the dedup/similarity family (VERDICT r05
item 6): synthesize a 10×-sf0.1 documents+embeddings corpus with the SAME
distributional shape as the driver testdata (vocabulary and word-frequency
profile sampled from sf0.1, matched words-per-doc range, matched exact-dup
rate; per-label Gaussian embedding clusters with centers/σ estimated from
sf0.1), then time the pair-join/LSH operators on the extra 10× step.

The corpus is deliberately NOT ten perturbed copies of sf0.1 — that would
multiply near-dup density tenfold and make the pair joins blow up for data
reasons, telling us nothing about plan scaling. Matching the generative
process keeps dup density comparable so the measured ratio isolates the
ENGINE's behaviour on 10× rows.

Deterministic (seed below), build-once (fingerprint-keyed like
sources/silver.py), written under spark-warehouse/ (gitignored).

Usage:  python tools/scale10x.py [--factor=N] [--baseline=M] [query ...]
        (default queries: minhash_lsh_dups duplicate_span_pairs
         embedding_lsh_dups simhash_near_dups)
--factor (default 10) picks the corpus size (N x sf0.1); --baseline
(default: sf0.1 itself, or the 10x corpus when factor=100) picks the
smaller corpus the step is measured against — so factor=100 records the
FIFTH decade (10x -> 100x), not a two-decade jump. Prints one JSON line
with per-query [baseline s, factor s] min-of-2 and the ratio; pretty
lines to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
FACTOR = 10
SEED = 20260814


def out_dir(factor: int) -> str:
    return os.path.join(REPO, "spark-warehouse", f"scale{factor}x")

DEFAULT = (
    "minhash_lsh_dups",
    "duplicate_span_pairs",
    "embedding_lsh_dups",
    "simhash_near_dups",
)


def _fingerprint(factor: int) -> dict:
    fp = {"factor": factor, "seed": SEED, "v": 4}  # v4: baskets sampled w/o replacement
    for t in ("documents", "embeddings", "lineitem"):
        st = os.stat(os.path.join(SRC, f"{t}.parquet"))
        fp[t] = [st.st_mtime_ns, st.st_size]
    return fp


def build_corpus(factor: int = FACTOR) -> str:
    """Build (iff absent/stale) the ``factor``× documents+embeddings+
    lineitem parquet dir (factor=10 is the fourth decade's corpus,
    factor=100 the fifth's)."""
    OUT = out_dir(factor)
    meta_path = os.path.join(OUT, "_meta.json")
    fp = _fingerprint(factor)
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                if json.load(f) == fp and all(
                    os.path.exists(os.path.join(OUT, f"{t}.parquet"))
                    for t in ("documents", "embeddings", "lineitem")
                ):
                    return OUT
        except (json.JSONDecodeError, OSError):
            pass

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    os.makedirs(OUT, exist_ok=True)

    # --- documents: empirical vocab/frequency/length profile from sf0.1 ---
    src_docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    texts = src_docs.column("text").to_pylist()
    langs = src_docs.column("lang").to_pylist()
    sources = src_docs.column("source").to_pylist()
    words: list[str] = []
    lens: list[int] = []
    for t in texts:
        ws = t.split(" ")
        words.extend(ws)
        lens.append(len(ws))
    vocab, counts = np.unique(np.array(words), return_counts=True)
    word_p = counts / counts.sum()
    lens_arr = np.array(lens)
    lang_vals, lang_counts = np.unique(np.array(langs), return_counts=True)
    lang_p = lang_counts / lang_counts.sum()
    src_vals, src_counts = np.unique(np.array(sources), return_counts=True)
    src_p = src_counts / src_counts.sum()

    n_docs = len(texts) * factor
    # exact-dup rate matched to source (sf0.1: 8 dup docs / 5000)
    n_dups = (len(texts) - len(set(texts))) * factor
    doc_lens = rng.choice(lens_arr, size=n_docs)
    # SHARDED vocabulary: each 10× segment gets its own disjoint copy of
    # the vocab (shard 0 = the original words). A faithful bigger corpus
    # has more TOPICS at the same within-topic density, not 10× more docs
    # drawn from one 31-word topic — the latter makes near-dup pair counts
    # quadratic in corpus size by construction (measured: simhash pairs
    # ×92 for ×10 docs) and would measure the data, not the engine.
    # Cross-shard docs share no words, so shingle/simhash/minhash pair
    # candidates stay within shards and density per doc is preserved.
    shard_of_doc = rng.integers(0, factor, size=n_docs)
    out_texts: list[str] = []
    for i in range(n_docs):
        if i >= n_docs - n_dups and out_texts:
            out_texts.append(out_texts[int(rng.integers(0, len(out_texts)))])
        else:
            ws = rng.choice(vocab, size=int(doc_lens[i]), p=word_p)
            s = int(shard_of_doc[i])
            if s:
                ws = [f"{w}{s}" for w in ws]
            out_texts.append(" ".join(ws))
    docs_tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(rng.choice(lang_vals, size=n_docs, p=lang_p)),
            "source": pa.array(rng.choice(src_vals, size=n_docs, p=src_p)),
            "n_chars": pa.array([len(t) for t in out_texts], pa.int64()),
        }
    )
    pq.write_table(docs_tbl, os.path.join(OUT, "documents.parquet"))

    # --- embeddings: per-label Gaussian clusters estimated from sf0.1 ---
    src_emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    emb = np.array(src_emb.column("embedding").to_pylist(), dtype="float64")
    lab = np.array(src_emb.column("label").to_pylist())
    lab_vals, lab_counts = np.unique(lab, return_counts=True)
    lab_p = lab_counts / lab_counts.sum()
    centers = {int(v): emb[lab == v].mean(axis=0) for v in lab_vals}
    sigma = float(np.mean([emb[lab == v].std() for v in lab_vals]))
    n_vecs = len(emb) * factor
    out_lab = rng.choice(lab_vals, size=n_vecs, p=lab_p)
    vecs = np.stack([centers[int(v)] for v in out_lab]) + rng.normal(
        0.0, sigma, size=(n_vecs, emb.shape[1])
    )
    emb_tbl = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                vecs.astype("float32").tolist(), pa.list_(pa.float32())
            ),
            "label": pa.array(out_lab.astype("int32"), pa.int32()),
        }
    )
    pq.write_table(emb_tbl, os.path.join(OUT, "embeddings.parquet"))

    # --- lineitem (r07, VERDICT r06 item 6): the graph family's source ---
    # Only (l_orderkey, l_partkey) matter to the silver co-purchase path
    # (sources/silver.py reads exactly those two columns). 10× orders with
    # basket sizes drawn from the empirical distribution and part picks
    # from the empirical part-popularity profile — but over a SHARDED part
    # domain (each 10× segment gets a disjoint copy of the part id space,
    # shard 0 = the original ids, the vocabulary-shard move applied to
    # parts). TPC-H itself scales the part count with SF; keeping 20k
    # parts under 10× orders would inflate per-pair support ~10× and grow
    # the Σ basket² pair table superlinearly FOR DATA REASONS, measuring
    # the corpus, not the engine. Cross-shard orders share no parts, so
    # pair density per part is preserved and the measured ratio isolates
    # plan scaling.
    src_li = pq.read_table(
        os.path.join(SRC, "lineitem.parquet"), columns=["l_orderkey", "l_partkey"]
    )
    ok = np.array(src_li.column("l_orderkey").to_pylist(), dtype=np.int64)
    pk = np.array(src_li.column("l_partkey").to_pylist(), dtype=np.int64)
    _, basket_sizes = np.unique(ok, return_counts=True)
    part_vals, part_counts = np.unique(pk, return_counts=True)
    part_p = part_counts / part_counts.sum()
    stride = int(part_vals.max()) + 1
    n_orders10 = len(basket_sizes) * factor
    sizes10 = rng.choice(basket_sizes, size=n_orders10)
    shard_of_order = rng.integers(0, factor, size=n_orders10)
    total_rows = int(sizes10.sum())
    out_ok = np.repeat(np.arange(1, n_orders10 + 1, dtype=np.int64), sizes10)
    # Parts within an order are distinct (ADVICE r07: the earlier i.i.d.
    # per-row draw could repeat a part inside a basket, and the silver
    # path's distinct() then deflated effective basket sizes versus the
    # empirical distribution this generator claims to preserve). Draw
    # i.i.d., then redraw within-order duplicates until none remain —
    # baskets are ≤ ~7 parts over a ~20k-part domain, so collisions are
    # rare and the redraw converges in a handful of vectorized passes.
    out_pk = rng.choice(part_vals, size=total_rows, p=part_p)
    for _ in range(200):
        order_idx = np.lexsort((out_pk, out_ok))
        so, sp = out_ok[order_idx], out_pk[order_idx]
        dup = np.zeros(total_rows, dtype=bool)
        dup[1:] = (so[1:] == so[:-1]) & (sp[1:] == sp[:-1])
        if not dup.any():
            break
        redraw = order_idx[dup]
        out_pk[redraw] = rng.choice(part_vals, size=len(redraw), p=part_p)
    else:
        raise RuntimeError("within-order part dedup did not converge")
    out_pk = out_pk + stride * np.repeat(shard_of_order, sizes10)
    li_tbl = pa.table(
        {
            "l_orderkey": pa.array(out_ok, pa.int64()),
            "l_partkey": pa.array(out_pk, pa.int64()),
        }
    )
    pq.write_table(li_tbl, os.path.join(OUT, "lineitem.parquet"))

    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(fp, f)
    os.replace(tmp, meta_path)
    return OUT


# Queries that read the events table: when any is requested, the corpus
# dirs also get a scaled events.parquet (built lazily — the main corpus
# fingerprint is untouched so existing document/graph corpora never
# rebuild just because the events generator appeared).
EVENTS_FAMILY = (
    "events_10min_windows",
    "user_sessions",
    "events_sliding_windows",
    "user_running_stats",
    "user_running_stats_salted",
    "events_gapfill_zero",
    "events_hourly",
    "events_rolling_1h",
    "events_cube",
    "events_json_stats",
    "user_value_trend",
    "event_value_histogram",
    "event_funnel_conversion",
    "event_transition_bigrams",
    "user_event_pivot",
    "user_retention_cohorts",
    "hll_distinct_users",
    "kmv_distinct_users",
    "cm_sketch_heavy_hitters",
    "streaming_kmv_distinct",
    "streaming_kmv_distinct_salted",
    "streaming_cm_sketch_cells",
)


def build_events(factor: int = FACTOR) -> str:
    """Build (iff absent/stale) the ``factor``× events.parquet inside the
    corpus dir (VERDICT r08 item 5 — a scaling decade for the
    streaming/events family).

    Scaling model: each segment is a DISJOINT-USER copy of the source
    events (user_id and event_id offset by a per-shard stride, shard 0 =
    the originals; ts / event_type / value / props kept verbatim). A
    bigger event stream is more USERS at the same per-user behaviour —
    the windowed aggregations then see factor× rows into the same time
    grid (denser groups, the map-side-combine stress), while per-user
    structures (sessions, running windows) keep their source density, so
    the measured ratio isolates engine scaling, not a drifting session
    or window distribution. The same reasoning as the document
    vocabulary shards, applied to the user dimension.
    """
    OUT = out_dir(factor)
    meta_path = os.path.join(OUT, "_events_meta.json")
    st = os.stat(os.path.join(SRC, "events.parquet"))
    fp = {
        "factor": factor,
        "seed": SEED,
        "v": 1,
        "events": [st.st_mtime_ns, st.st_size],
    }
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                if json.load(f) == fp and os.path.exists(
                    os.path.join(OUT, "events.parquet")
                ):
                    return OUT
        except (json.JSONDecodeError, OSError):
            pass

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(OUT, exist_ok=True)
    src = pq.read_table(os.path.join(SRC, "events.parquet"))
    eid_stride = pc.max(src.column("event_id")).as_py() + 1
    uid_stride = pc.max(src.column("user_id")).as_py() + 1
    # Streamed shard-by-shard (one row group per shard): at factor=1000
    # the concatenated table is ~15 GB of Arrow strings — the writer
    # must scale with the FACTOR, not hold the product in memory (the
    # generator obeying the same fixed-width-at-scale rule as the
    # engine it feeds).
    writer = pq.ParquetWriter(os.path.join(OUT, "events.parquet"), src.schema)
    try:
        for s in range(factor):
            t = src
            if s:
                t = t.set_column(
                    t.schema.get_field_index("event_id"),
                    "event_id",
                    pc.add(t.column("event_id"), s * eid_stride),
                )
                t = t.set_column(
                    t.schema.get_field_index("user_id"),
                    "user_id",
                    pc.add(t.column("user_id"), s * uid_stride),
                )
            writer.write_table(t)
    finally:
        writer.close()
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(fp, f)
    os.replace(tmp, meta_path)
    return OUT


def main() -> None:
    argv = list(sys.argv[1:])
    factor, baseline = FACTOR, None
    names: list[str] = []
    for a in argv:
        if a.startswith("--factor="):
            factor = int(a.split("=", 1)[1])
        elif a.startswith("--baseline="):
            baseline = int(a.split("=", 1)[1])
        else:
            names.append(a)
    if baseline is None and factor > FACTOR:
        # default to ONE decade below the target (100x -> baseline 10x,
        # 1000x -> baseline 100x); the old constant-FACTOR default made
        # --factor=1000 silently measure a TWO-decade jump (ADVICE r08).
        baseline = max(1, factor // 10)
    names = tuple(names) or DEFAULT
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    big_dir = build_corpus(factor)
    base_dir = SRC if baseline is None else build_corpus(baseline)
    if any(n in EVENTS_FAMILY for n in names):
        build_events(factor)
        if baseline is not None:
            build_events(baseline)
    from imdb_mapreduce_spark.session import get_spark

    spark = get_spark("scale10x")
    spark.range(1).count()
    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        times = []
        rows = []
        for sf_dir in (base_dir, big_dir):
            best = None
            n = 0
            for _ in range(2):  # min-of-2, matching tools/scaling_curve.py
                t = time.time()
                n = len(fn(spark, sf_dir).collect())
                el = time.time() - t
                best = el if best is None else min(best, el)
            times.append(round(best, 3))
            rows.append(n)
        ratio = round(times[1] / times[0], 2) if times[0] > 0 else float("nan")
        results[name] = {"sec": times, "rows": rows, "ratio_step": ratio}
        base_tag = "sf0.1" if baseline is None else f"{baseline}x"
        print(
            f"{name:28s} {base_tag} {times[0]:7.2f}s  {factor}x {times[1]:7.2f}s  "
            f"x{ratio:<6} rows {rows[0]} -> {rows[1]}",
            file=sys.stderr,
        )
    step = ("sf0.1" if baseline is None else f"{baseline}x-sf0.1") + f" -> {factor}x-sf0.1"
    print(json.dumps({"step": step, "queries": results}))


if __name__ == "__main__":
    main()
