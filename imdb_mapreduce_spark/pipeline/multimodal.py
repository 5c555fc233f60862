"""Multimodal (binary) column plumbing ([NORTH-STAR]).

Treats media as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` — the correct Spark shape for decode /
feature-extract / resize / frame-sample at 100 TB:

- binary payloads stay columnar (Arrow) end-to-end; no row-at-a-time Python;
- the UDF sees a *batch iterator* so per-batch setup (codec init, model
  load) amortizes;
- partitioning is by size (``maxPartitionBytes``), not row count, so huge
  blobs don't skew tasks.

The container has no image/audio codecs, so the default tested path uses a
deterministic fake decode — the Spark-side plumbing (schema, batching, UDF
signature) is real and oracle-checked: the fake decode is a pure function
of byte length, which SQL can replicate. A REAL decode path exists behind
an import gate (``decode_image`` / ``media_metadata(real=True)``): it runs
wherever Pillow is installed (skipif-gated test) and raises a
clearly-marked NotImplementedError here.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from imdb_mapreduce_spark.plans.registry import register
from imdb_mapreduce_spark.sources.star import load_table

if TYPE_CHECKING:
    import pandas as pd

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


def decode_image(payload: bytes) -> "tuple[int, int, str]":
    """REAL image decode → (width, height, format), PIL-gated: runs
    wherever Pillow is installed, raises a clearly-marked
    NotImplementedError in codec-less environments (this container). The
    tested default pipeline uses :func:`fake_decode_meta`; deployments
    with codecs switch by passing ``real=True`` to
    :func:`media_metadata`."""
    try:
        from PIL import Image
    except ImportError as e:  # codec-less container: stub per build contract
        raise NotImplementedError(
            "image decoding requires PIL/opencv, not available in this "
            "environment; use fake_decode_meta for the tested plumbing path"
        ) from e
    import io

    with Image.open(io.BytesIO(payload)) as im:
        return im.width, im.height, (im.format or "unknown").lower()


def _real_decode_batches(
    batches: Iterator["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    """mapInPandas worker for the PIL path — same batch shape and output
    schema as the fake-decode worker, so the surrounding plan (Arrow
    transfer, partition-by-bytes, downstream rollups) is identical."""
    import pandas as pd

    for batch in batches:
        metas = [decode_image(p) for p in batch["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"].values,
                "n_bytes": [len(p) for p in batch["payload"]],
                "width": [m[0] for m in metas],
                "height": [m[1] for m in metas],
                "format": [m[2] for m in metas],
            }
        )


def fake_decode_meta(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake decode: metadata as a pure function of the bytes.
    Keeps the full mapInPandas pipeline testable without codecs."""
    n = len(payload)
    return n, n % 640 + 1, n % 480 + 1, "png" if n % 2 == 0 else "jpeg"


def _decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """mapInPandas worker: per-batch vectorized metadata extraction.
    A real decoder would init its codec once here, before the loop."""
    import pandas as pd

    for batch in batches:
        metas = [fake_decode_meta(p) for p in batch["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"].values,
                "n_bytes": [m[0] for m in metas],
                "width": [m[1] for m in metas],
                "height": [m[2] for m in metas],
                "format": [m[3] for m in metas],
            }
        )


def with_media_column(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload column (here: utf-8 bytes of the
    text stand in for image bytes; in production this is the raw blob read
    from object storage)."""
    return docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))


def media_metadata(docs: DataFrame, real: bool = False) -> DataFrame:
    """binary column → typed metadata via Arrow-batched mapInPandas.

    ``real=True`` selects the PIL decode worker: ``docs`` must then carry
    an actual image-bytes ``payload`` binary column (production shape)
    and the executors need Pillow. The default path synthesizes a payload
    from text (:func:`with_media_column`) and fake-decodes it — same
    schema and plan either way."""
    if real:
        return docs.select("doc_id", "payload").mapInPandas(
            _real_decode_batches, MEDIA_META_SCHEMA
        )
    return with_media_column(docs).mapInPandas(_decode_batches, MEDIA_META_SCHEMA)


@register(
    "media_metadata_stats",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
           CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
    FROM documents
    """,
    tags=("multimodal", "north-star", "pandas-udf"),
)
def media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal plumbing end-to-end: binary column → mapInPandas
    (Arrow batches) → typed metadata. Oracle replicates the deterministic
    fake decode in SQL over utf-8 byte lengths — so the whole Python/Arrow
    round-trip is value-checked, not just smoke-checked."""
    docs = load_table(spark, "documents", sf_dir)
    return media_metadata(docs)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("scale_num", LongType()),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_offset", LongType()),
    ]
)

TARGET_EDGE = 224  # the usual vision-model input edge


def fake_resize_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic resize stub: fit the fake (w, h) inside TARGET_EDGE
    preserving aspect ratio; returns (out_w, out_h, scale_numerator). A
    real implementation decodes + resamples here — same signature."""
    _, w, h, _ = (len(payload), len(payload) % 640 + 1, len(payload) % 480 + 1, "")
    long_edge = max(w, h)
    out_w = w * TARGET_EDGE // long_edge
    out_h = h * TARGET_EDGE // long_edge
    return out_w, out_h, long_edge


def _resize_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    for batch in batches:
        metas = [fake_resize_meta(p) for p in batch["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"].values,
                "out_width": [m[0] for m in metas],
                "out_height": [m[1] for m in metas],
                "scale_num": [m[2] for m in metas],
            }
        )


def _frame_sample_batches(
    batches: Iterator["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    """Video frame sampling stub: K evenly spaced byte offsets per payload
    (a real sampler seeks keyframes; the fan-out row shape — one row per
    sampled frame — is the part the plan cares about)."""
    import pandas as pd

    K = 4
    out = {"doc_id": [], "frame_index": [], "frame_offset": []}
    for batch in batches:
        for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
            n = len(payload)
            for i in range(K):
                out["doc_id"].append(doc_id)
                out["frame_index"].append(i)
                out["frame_offset"].append(i * n // K)
        yield pd.DataFrame(out)
        out = {"doc_id": [], "frame_index": [], "frame_offset": []}


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_lower", LongType()),
        StructField("n_upper", LongType()),
        StructField("n_digit", LongType()),
        StructField("n_space", LongType()),
        StructField("byte_sum", LongType()),
    ]
)


def _feature_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Feature extraction over raw bytes, vectorized with numpy per Arrow
    batch — the stand-in for an embedding/CNN feature stage: the byte
    buffer never becomes Python objects row-by-row."""
    import numpy as np
    import pandas as pd

    for batch in batches:
        rows = {k: [] for k in ("doc_id", "n_lower", "n_upper", "n_digit", "n_space", "byte_sum")}
        for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8)
            rows["doc_id"].append(doc_id)
            rows["n_lower"].append(int(((b >= 97) & (b <= 122)).sum()))
            rows["n_upper"].append(int(((b >= 65) & (b <= 90)).sum()))
            rows["n_digit"].append(int(((b >= 48) & (b <= 57)).sum()))
            rows["n_space"].append(int((b == 32).sum()))
            rows["byte_sum"].append(int(b.sum()))
        yield pd.DataFrame(rows)


@register(
    "media_feature_extract",
    oracle="""
    SELECT doc_id,
           CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS BIGINT) AS n_lower,
           CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper,
           CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
           CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS n_space,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(1, length(text)),
               i -> CAST(ascii(text[i]) AS BIGINT))), (a, b) -> a + b) AS byte_sum
    FROM documents
    """,
    tags=("multimodal", "north-star", "pandas-udf", "features"),
)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature-extraction stage of the multimodal pipeline: numpy
    vectorized per Arrow batch inside mapInPandas, value-checked against a
    pure-SQL recomputation of the same features (valid because the corpus
    is ASCII: byte classes == char classes)."""
    docs = load_table(spark, "documents", sf_dir)
    return with_media_column(docs).mapInPandas(_feature_batches, FEATURES_SCHEMA)


@register(
    "media_resize_plan",
    oracle=f"""
    SELECT doc_id,
           CAST((octet_length(encode(text)) % 640 + 1) * {TARGET_EDGE}
                // greatest(octet_length(encode(text)) % 640 + 1,
                            octet_length(encode(text)) % 480 + 1) AS INTEGER) AS out_width,
           CAST((octet_length(encode(text)) % 480 + 1) * {TARGET_EDGE}
                // greatest(octet_length(encode(text)) % 640 + 1,
                            octet_length(encode(text)) % 480 + 1) AS INTEGER) AS out_height,
           CAST(greatest(octet_length(encode(text)) % 640 + 1,
                         octet_length(encode(text)) % 480 + 1) AS BIGINT) AS scale_num
    FROM documents
    """,
    tags=("multimodal", "north-star", "pandas-udf"),
)
def media_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning via mapInPandas — the metadata
    half of an image-resize stage, oracle-checked end to end."""
    docs = load_table(spark, "documents", sf_dir)
    return with_media_column(docs).mapInPandas(_resize_batches, RESIZED_SCHEMA)


@register(
    "media_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_index,
           CAST(i * octet_length(encode(text)) // 4 AS BIGINT) AS frame_offset
    FROM documents, generate_series(0, 3) AS t(i)
    """,
    tags=("multimodal", "north-star", "pandas-udf"),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one input blob fans out to K frame rows inside the
    Pandas UDF (row-expanding mapInPandas — the shape for video→frames,
    audio→windows, doc→chunks)."""
    docs = load_table(spark, "documents", sf_dir)
    return with_media_column(docs).mapInPandas(_frame_sample_batches, FRAMES_SCHEMA)


@register(
    "media_format_rollup",
    oracle="""
    SELECT CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
           MAX(CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER)) AS max_width
    FROM documents
    GROUP BY 1
    """,
    tags=("multimodal", "north-star"),
)
def media_format_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational post-aggregation over UDF-derived metadata — mixing the
    Arrow path with JVM aggregation in one plan (ints only: exact)."""
    docs = load_table(spark, "documents", sf_dir)
    meta = media_metadata(docs)
    return meta.groupBy("format").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("width").alias("max_width"),
    )


HISTOGRAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bucket", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def _histogram_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """16-bucket byte histogram (high nibble) per payload — np.bincount
    over the raw buffer, the classic content-type/entropy feature for
    binary columns. Long format (doc_id, bucket, n_bytes), zero buckets
    omitted, so the output is a plain relation any SQL engine can check."""
    import numpy as np
    import pandas as pd

    for batch in batches:
        ids: list = []
        buckets: list = []
        counts: list = []
        for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
            h = np.bincount(
                np.frombuffer(payload, dtype=np.uint8) >> 4, minlength=16
            )
            nz = np.nonzero(h)[0]
            ids.extend([doc_id] * len(nz))
            buckets.extend(int(b) for b in nz)
            counts.extend(int(c) for c in h[nz])
        yield pd.DataFrame({"doc_id": ids, "bucket": buckets, "n_bytes": counts})


@register(
    "media_byte_histogram",
    oracle="""
    WITH chars AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, length(text)),
                    i -> ascii(text[i]) // 16)) AS bucket
      FROM documents)
    SELECT doc_id, CAST(bucket AS INT) AS bucket, COUNT(*) AS n_bytes
    FROM chars GROUP BY doc_id, bucket
    """,
    tags=("multimodal", "north-star", "pandas-udf", "features"),
)
def media_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-distribution features over the opaque binary column: 16
    high-nibble buckets per payload, numpy-vectorized per Arrow batch.
    Oracle recomputes the histogram in pure SQL (valid because the corpus
    is ASCII: byte identity == char codepoint)."""
    docs = load_table(spark, "documents", sf_dir)
    return with_media_column(docs).mapInPandas(_histogram_batches, HISTOGRAM_SCHEMA)


# Perceptual-hash dedup over the binary payloads (r05 session 2)
PHASH_BITS = 64  # one bit per (byte % 64) histogram bucket
PHASH_BANDS = 4  # 4 bands x 16 bits: exact for hamming <= 2 (pigeonhole)
PHASH_HAM_MAX = 2


def _phash_hist_batches(batches):
    """64-bucket byte histogram (byte % 64) per payload — finer than the
    16-nibble feature histogram: text-like payloads have near-identical
    nibble distributions, so a 16-bit hash collides the whole corpus
    (measured: 97k of 125k possible pairs); 64 buckets give the per-doc
    share noise the corpus-relative bits need to discriminate."""
    import numpy as np
    import pandas as pd

    for batch in batches:
        ids: list = []
        buckets: list = []
        counts: list = []
        for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
            h = np.bincount(
                np.frombuffer(payload, dtype=np.uint8) % 64, minlength=64
            )
            nz = np.nonzero(h)[0]
            ids.extend([doc_id] * len(nz))
            buckets.extend(int(b) for b in nz)
            counts.extend(int(c) for c in h[nz])
        yield pd.DataFrame({"doc_id": ids, "bucket": buckets, "n_bytes": counts})


@register(
    "media_phash_dedup",
    oracle=f"""
    WITH chars AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, length(text)),
                    i -> ascii(text[i]) % 64)) AS bucket
      FROM documents),
    hist AS (
      SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM chars GROUP BY 1, 2),
    tot AS (
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS total FROM hist GROUP BY 1),
    corpus AS (
      SELECT bucket, CAST(SUM(n) AS BIGINT) AS cn FROM hist GROUP BY 1),
    grand AS (SELECT CAST(SUM(cn) AS BIGINT) AS ct FROM corpus),
    ph AS (
      -- bit i: doc's bucket share above the CORPUS share, compared by
      -- integer cross-multiplication (n/total > cn/ct <=> n*ct > cn*total)
      SELECT h.doc_id,
             CAST(SUM(CASE WHEN h.bucket < 63 AND h.n * g.ct > c.cn * t.total
                           THEN (CAST(1 AS BIGINT) << CAST(h.bucket AS INT))
                           ELSE 0 END) AS BIGINT) AS phash
      FROM hist h
      JOIN tot t ON t.doc_id = h.doc_id
      JOIN corpus c ON c.bucket = h.bucket
      CROSS JOIN grand g
      GROUP BY h.doc_id),
    bands AS (
      SELECT doc_id, phash, b,
             (phash // (CASE b WHEN 0 THEN 1 WHEN 1 THEN 65536
                               WHEN 2 THEN 4294967296
                               ELSE 281474976710656 END)) % 65536 AS bv
      FROM ph
      CROSS JOIN (SELECT UNNEST(generate_series(0, {PHASH_BANDS - 1})) AS b) g),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, a.phash AS p1,
                      b.doc_id AS doc2, b.phash AS p2
      FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
                               AND a.doc_id < b.doc_id)
    SELECT doc1, doc2,
           CAST(bit_count(xor(p1, p2)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(p1, p2)) <= {PHASH_HAM_MAX}
    """,
    tags=("multimodal", "north-star", "dedup", "phash"),
)
def media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection for OPAQUE BINARY payloads — the
    multimodal arm of the dedup family: a {PHASH_BITS}-bit perceptual
    hash (bit i set iff byte-histogram bucket i exceeds the uniform
    share), banded {PHASH_BANDS}×16 for sub-quadratic candidate pairing,
    verified by exact Hamming distance ≤ {PHASH_HAM_MAX}. The banding is
    EXACT at this threshold (≤2 differing bits leave ≥2 of 4 bands
    untouched — pigeonhole), so the approximate plan returns the same
    pairs a quadratic scan would.

    The histogram runs on the sanctioned Arrow path over the binary
    column (the media family's plumbing); everything after is JVM
    integer arithmetic, hash-portable (the oracle recomputes byte
    identity from chars — valid on this ASCII corpus). Real images would
    swap the histogram for a DCT/gradient phash inside the same batches;
    banding, verification, and scale shape are unchanged."""
    from pyspark.sql.window import Window

    docs = load_table(spark, "documents", sf_dir)
    hist = with_media_column(docs).mapInPandas(_phash_hist_batches, HISTOGRAM_SCHEMA)
    # r15 opt (guide §2.4, §5): the Arrow histogram pass previously ran
    # FOUR times in the one action — under the tot join's build side and
    # under the corpus/grand broadcast subtrees (MapInPandas has no
    # exchange for ReuseExchange to dedupe beneath a broadcast). Two
    # fixes: (1) `corpus` is pinned (bounded: one row per byte-histogram
    # bucket, ≤ 64) and `grand` derives from the PIN, so neither
    # broadcast re-runs the kernel; (2) the per-doc total comes from a
    # window sum over the SAME doc_id partitioning the final phash
    # groupBy needs — one exchange, no hist⋈tot self-join, no second
    # kernel run on the join's build side. Kernel runs: 4 → 2 (the main
    # path and the pin). Integer sums either way — output identical.
    corpus = (
        hist.groupBy("bucket")
        .agg(F.sum("n_bytes").cast("long").alias("cn"))
        .localCheckpoint(eager=True)
    )
    grand = corpus.agg(F.sum("cn").cast("long").alias("ct"))
    # bit i: doc's bucket share above the CORPUS share, compared by exact
    # integer cross-multiplication (n/total > cn/ct <=> n*ct > cn*total) —
    # a per-doc mean threshold degenerates on text-like payloads (every
    # doc's nibble distribution is near-uniform, so all phashes collide
    # into the full quadratic pair set; measured before this fix)
    ph = (
        hist.withColumn(
            "total",
            F.sum("n_bytes").over(Window.partitionBy("doc_id")).cast("long"),
        )
        .join(F.broadcast(corpus), "bucket")
        .crossJoin(F.broadcast(grand))
        .groupBy("doc_id")
        .agg(
            F.sum(
                # bucket 63 excluded: bit 63 is the BIGINT sign bit and
                # DuckDB raises on 1<<63 (same guard as the bloom filter)
                F.when(
                    (F.col("bucket") < 63)
                    & (F.col("n_bytes") * F.col("ct") > F.col("cn") * F.col("total")),
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))"),
                ).otherwise(F.lit(0).cast("bigint"))
            )
            .cast("long")
            .alias("phash")
        )
    )
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(PHASH_BANDS - 1))).alias("b"),
    ).withColumn(
        "bv", F.expr("CAST(shiftright(phash, CAST(b * 16 AS INT)) % 65536 AS INT)")
    )
    a = bands.select(
        F.col("doc_id").alias("doc1"), F.col("phash").alias("p1"), "b", "bv"
    )
    b = bands.select(
        F.col("doc_id").alias("doc2"), F.col("phash").alias("p2"), "b", "bv"
    )
    ham = F.bit_count(F.col("p1").bitwiseXOR(F.col("p2")))
    return (
        a.join(b, ["b", "bv"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "p1", "doc2", "p2")
        .distinct()
        .select("doc1", "doc2", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
    )
