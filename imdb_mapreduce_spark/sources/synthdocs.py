"""`synthdocs` — a Spark 4 Python DataSource generating a deterministic
synthetic document corpus, partition-parallel.

Why a DataSource and not a script: corpus synthesis for scale tests
(tools/scale10x.py) runs on the DRIVER and writes parquet before Spark ever
sees a row. Registering the generator as a `pyspark.sql.datasource
.DataSource` makes synthesis part of the PLAN: each executor generates only
its doc_id range, nothing is materialized up front, and `spark.read
.format("synthdocs").option("n_docs", 10**9)` scales to any size the
cluster can hold — the declarative form of the reference's offline data
prep (``/root/reference/src/master/dataInit.erl`` builds its tables
driver-side too; this is the connector-surface answer).

Determinism contract: every row is a pure function of (seed, doc_id) —
`numpy.default_rng((seed, doc_id))` — so the SAME corpus comes back for
any partition count, executor layout, or re-read (pinned by
tests/test_synthdocs.py). That is the property that makes synthetic scale
corpora reproducible across cluster sizes.

Usage:
    spark.dataSource.register(SynthDocsDataSource)
    df = (spark.read.format("synthdocs")
          .option("n_docs", 5000).option("seed", 7)
          .option("partitions", 32).load())

Schema matches the driver `documents` table (doc_id, text, lang, source,
n_chars) so every registered documents query runs on generated corpora
unchanged.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

LANGS = ("en", "de", "fr", "es", "zh")
SOURCES = ("web", "books", "wiki", "code")
VOCAB_SIZE = 4096
ZIPF_A = 1.3  # word-frequency skew (natural-language-ish)
MIN_WORDS, MAX_WORDS = 8, 96


def _vocab() -> list:
    """The shared word list: v0000..v4095 (content-free but distinct —
    shingle/minhash/token operators only need identity and frequency)."""
    return [f"v{i:04d}" for i in range(VOCAB_SIZE)]


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start, self.end = start, end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_docs = int(options.get("n_docs", 1000))
        self.seed = int(options.get("seed", 7))
        self.n_parts = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        if self.n_docs <= 0:  # empty corpus: one empty partition
            return [_IdRange(0, 0)]
        step = -(-self.n_docs // self.n_parts)  # ceil; >= 1 here
        return [
            _IdRange(lo, min(lo + step, self.n_docs))
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, part: _IdRange):
        # shared pure (seed, doc_id) generator — numpy imported inside it,
        # on the executor (planning never needs worker deps)
        yield from _gen_rows(self.seed, part.start, part.end)


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return (
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint"
        )

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema):
        return SynthDocsStreamReader(self.options)


def _gen_rows(seed: int, start: int, end: int):
    """Rows for [start, end): the SAME pure (seed, doc_id) function the
    batch reader uses, so batch read ≡ streamed union (pytest-pinned)."""
    import numpy as np

    vocab = np.array(_vocab())
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype="float64")
    p = ranks**-ZIPF_A
    p /= p.sum()
    for doc_id in range(start, end):
        rng = np.random.default_rng((seed, doc_id))
        n_words = int(rng.integers(MIN_WORDS, MAX_WORDS + 1))
        words = rng.choice(vocab, size=n_words, p=p)
        text = " ".join(words.tolist())
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        source = SOURCES[int(rng.integers(0, len(SOURCES)))]
        yield (doc_id, text, lang, source, len(text))


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Bounded micro-batch stream over the same corpus: each poll emits the
    next ``batch_rows`` doc_ids until ``n_docs`` is exhausted, then empty
    batches forever — the shape of replaying a bounded corpus as a stream
    (soak tests, stream/batch parity checks) through the Spark 4
    `simpleStreamReader` API. Offsets are plain dicts checkpointed by the
    engine; `readBetweenOffsets` replays any [start, end) range exactly
    (determinism makes replay free)."""

    def __init__(self, options: dict) -> None:
        self.n_docs = int(options.get("n_docs", 1000))
        self.seed = int(options.get("seed", 7))
        self.batch_rows = max(1, int(options.get("batch_rows", 250)))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = int(start["pos"])
        hi = min(lo + self.batch_rows, self.n_docs)
        # materialized list, not a generator: the engine pickles the
        # prefetched rows into its offset-range cache
        return list(_gen_rows(self.seed, lo, hi)), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(_gen_rows(self.seed, int(start["pos"]), int(end["pos"])))

    def commit(self, end: dict) -> None:
        pass
