"""Text analysis over the ``documents`` table ([NORTH-STAR]): quality
scoring, token counting, language-ID heuristic, fingerprinting.

Everything is built-in-function-only (whole-stage codegen; zero Python in
the hot path) and each query carries a full DuckDB oracle — the scalar
surfaces of both engines agree on these constructs (verified: ascii() is
codepoint-based in both, regexp classes are plain ASCII, list folds are
sequential).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from imdb_mapreduce_spark.plans.registry import register
from imdb_mapreduce_spark.sources.star import load_table

# BPE-ish tokenizer: letter runs, digit runs, single punctuation marks.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# Deterministic demo marker sets for the language-ID heuristic. The corpus
# is synthetic English-ish word soup, so real-language markers would be
# vacuous; these exercise the mechanics (per-language evidence counts +
# argmax with a fixed tie order) on words that actually occur.
LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "de": ("der", "und", "das"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "que"),
}


def _tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


@register(
    "doc_quality_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
           length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
           len(list_filter(string_split(text, ' '),
               x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS n_stopwords,
           CAST(len(list_filter(string_split(text, ' '),
               x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr
    FROM documents
    """,
    tags=("text", "north-star", "quality"),
)
def doc_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features: token counts, type-token ratio, punct and
    digit density, stopword ratio — the standard pre-training quality
    filter inputs (length/punct/stopword heuristics), one projection."""
    docs = load_table(spark, "documents", sf_dir)
    toks = _tokens()
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.expr(f"size(filter(split(text, ' '), x -> x IN ({stop_list})))")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "[.,;:!?]", ""))
        ).cast("long").alias("n_punct"),
        (F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))).cast("long").alias("n_digits"),
        n_stop.cast("long").alias("n_stopwords"),
        (n_stop.cast("double") / F.size(toks).cast("double")).alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")).alias(
            "ttr"
        ),
    )


@register(
    "token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_bpe_tokens,
           n_chars,
           CAST(n_chars AS DOUBLE)
             / CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS DOUBLE)
             AS chars_per_token
    FROM documents
    """,
    tags=("text", "north-star", "tokens"),
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex token counting (BPE-ish segmentation: letter runs / digit runs
    / punctuation) — the cheap token-budget estimator for corpus sizing."""
    docs = load_table(spark, "documents", sf_dir)
    n_tok = F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), 0))
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_bpe_tokens"),
        "n_chars",
        (F.col("n_chars").cast("double") / n_tok.cast("double")).alias("chars_per_token"),
    )


def _marker_count_sql(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(string_split(text, ' '), x -> x IN ({lst})))"


def _marker_count(words: tuple[str, ...]) -> Column:
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter(split(text, ' '), x -> x IN ({lst})))")


def _guess_col() -> Column:
    """THE language-guess expression — the single production predictor.
    ``lang_id_heuristic`` ships it and ``lang_id_confusion`` evaluates
    it; both import this helper (and its SQL twin ``_guess_sql``) so the
    eval can never silently diverge from the shipped function."""
    scores = {k: _marker_count(v) for k, v in LANG_MARKERS.items()}
    return (
        F.when(
            scores["en"]
            >= F.greatest(scores["de"], scores["fr"], scores["es"], F.lit(1)),
            "en",
        )
        .when(scores["de"] >= F.greatest(scores["fr"], scores["es"], F.lit(1)), "de")
        .when(scores["fr"] >= F.greatest(scores["es"], F.lit(1)), "fr")
        .when(scores["es"] >= 1, "es")
        .otherwise("unknown")
    )


def _guess_sql() -> str:
    """DuckDB twin of ``_guess_col`` — used by BOTH lang oracles."""
    return f"""CASE
             WHEN {_marker_count_sql(LANG_MARKERS["en"])} >= greatest(
                    {_marker_count_sql(LANG_MARKERS["de"])},
                    {_marker_count_sql(LANG_MARKERS["fr"])},
                    {_marker_count_sql(LANG_MARKERS["es"])}, 1) THEN 'en'
             WHEN {_marker_count_sql(LANG_MARKERS["de"])} >= greatest(
                    {_marker_count_sql(LANG_MARKERS["fr"])},
                    {_marker_count_sql(LANG_MARKERS["es"])}, 1) THEN 'de'
             WHEN {_marker_count_sql(LANG_MARKERS["fr"])} >= greatest(
                    {_marker_count_sql(LANG_MARKERS["es"])}, 1) THEN 'fr'
             WHEN {_marker_count_sql(LANG_MARKERS["es"])} >= 1 THEN 'es'
             ELSE 'unknown'
           END"""


@register(
    "lang_id_heuristic",
    oracle=f"""
    SELECT doc_id,
           {_marker_count_sql(LANG_MARKERS["en"])} AS score_en,
           {_marker_count_sql(LANG_MARKERS["de"])} AS score_de,
           {_marker_count_sql(LANG_MARKERS["fr"])} AS score_fr,
           {_marker_count_sql(LANG_MARKERS["es"])} AS score_es,
           {_guess_sql()} AS lang_guess
    FROM documents
    """,
    tags=("text", "north-star", "lang"),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID: per-language marker-word evidence counts,
    argmax with fixed priority order, 'unknown' when no evidence. On real
    multilingual data the marker sets come from per-language frequency
    tables; the plan shape (projection + CASE) is identical."""
    docs = load_table(spark, "documents", sf_dir)
    scores = {k: _marker_count(v) for k, v in LANG_MARKERS.items()}
    guess = _guess_col()
    return docs.select(
        "doc_id",
        scores["en"].cast("long").alias("score_en"),
        scores["de"].cast("long").alias("score_de"),
        scores["fr"].cast("long").alias("score_fr"),
        scores["es"].cast("long").alias("score_es"),
        guess.alias("lang_guess"),
    )


# md5-hex prefix thresholds: uniform over [0,1) in 1/16^k steps; string
# comparison of hex digests is engine-portable and content-stable.
SPLIT_TRAIN_END = "c"  # 12/16 = 75% train
SPLIT_VAL_END = "e"    # 2/16 = 12.5% val; rest test


@register(
    "content_sample",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE md5(text) < '2'
    """,
    tags=("text", "north-star", "sampling"),
)
def content_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling (~1/8 of the corpus: md5 hex
    digest below '2'): stable under re-runs, engine changes, partitioning,
    and corpus growth — the property `df.sample()` (RNG-based, engine-
    specific) cannot give. The canonical way to cut reproducible training
    subsets."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.filter(F.md5("text") < "2").select("doc_id", "lang", "n_chars")


@register(
    "dataset_split_assignment",
    oracle=f"""
    SELECT CASE WHEN md5(text) < '{SPLIT_TRAIN_END}' THEN 'train'
                WHEN md5(text) < '{SPLIT_VAL_END}' THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc_id
    FROM documents
    GROUP BY 1
    """,
    tags=("text", "north-star", "sampling"),
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment by content-hash range (75/12.5/12.5):
    membership is a pure function of content, so a document keeps its
    split across dataset versions — no leakage when the corpus is
    regenerated or re-partitioned."""
    docs = load_table(spark, "documents", sf_dir)
    split = (
        F.when(F.md5("text") < SPLIT_TRAIN_END, "train")
        .when(F.md5("text") < SPLIT_VAL_END, "val")
        .otherwise("test")
    )
    return docs.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id")
    )


@register(
    "doc_fingerprint_rolling",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, length(text)),
                 i -> CAST(ascii(text[i]) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS rhash,
           md5(text) AS md5_fp
    FROM documents
    """,
    tags=("text", "north-star", "fingerprint"),
)
def doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: 31-base polynomial rolling hash mod 1e9+7
    (the classic Rabin-Karp form, as a pure sequential fold) + md5. The
    rolling form supports incremental/windowed fingerprinting of shingles
    at scale; md5 is the portable content id."""
    docs = load_table(spark, "documents", sf_dir)
    rhash = F.expr(
        "aggregate(transform(sequence(1, length(text)),"
        " i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),"
        " CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)"
    )
    return docs.select("doc_id", rhash.alias("rhash"), F.md5("text").alias("md5_fp"))


_STOP_IN = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


@register(
    "doc_repetition_stats",
    oracle="""
    WITH lists AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    base AS (
      SELECT doc_id,
             len(ts) AS n_tokens,
             greatest(len(ts) - 1, 0) AS n_bigrams,
             len(list_distinct(list_transform(
                 generate_series(1, greatest(len(ts) - 1, 0)),
                 i -> ts[i] || ' ' || ts[i+1]))) AS n_distinct_bigrams,
             len(list_filter(generate_series(1, greatest(len(ts) - 1, 0)),
                 i -> ts[i] = ts[i+1])) AS n_adjacent_repeats
      FROM lists),
    tok AS (SELECT doc_id, unnest(ts) AS t FROM lists),
    tc AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    mx AS (SELECT doc_id, MAX(c) AS top_tok_count FROM tc GROUP BY 1)
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(m.top_tok_count AS BIGINT) AS top_tok_count,
           CAST(m.top_tok_count AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
             AS top_tok_frac,
           CAST(b.n_bigrams AS BIGINT) AS n_bigrams,
           CAST(b.n_bigrams - b.n_distinct_bigrams AS BIGINT) AS n_dup_bigrams,
           CAST(b.n_bigrams - b.n_distinct_bigrams AS DOUBLE)
             / CAST(NULLIF(b.n_bigrams, 0) AS DOUBLE) AS dup_bigram_frac,
           CAST(b.n_adjacent_repeats AS BIGINT) AS n_adjacent_repeats
    FROM base b JOIN mx m USING (doc_id)
    """,
    tags=("text", "north-star", "quality", "repetition"),
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition signals per document: most-frequent-token
    fraction, duplicate-bigram fraction, adjacent-token repeats. High
    values mark boilerplate/spam for filtering before training.

    Array-level metrics are pure projections (codegen); the top-token count
    is explode → two partial-agg shuffles (map-side combine on both), the
    standard scalable shape for per-doc mode computation. Bigrams come
    from zip_with over two slices — no index arithmetic, no ANSI
    out-of-bounds risk on short docs."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", _tokens().alias("ts"))
    base = toks.select(
        "doc_id",
        F.size("ts").cast("long").alias("n_tokens"),
        F.greatest(F.size("ts") - 1, F.lit(0)).cast("long").alias("n_bigrams"),
        F.expr(
            "size(array_distinct(zip_with("
            " slice(ts, 1, greatest(size(ts) - 1, 0)),"
            " slice(ts, 2, greatest(size(ts) - 1, 0)),"
            " (x, y) -> concat(x, ' ', y))))"
        ).cast("long").alias("n_distinct_bigrams"),
        F.expr(
            "size(filter(zip_with("
            " slice(ts, 1, greatest(size(ts) - 1, 0)),"
            " slice(ts, 2, greatest(size(ts) - 1, 0)),"
            " (x, y) -> x = y), b -> b))"
        ).cast("long").alias("n_adjacent_repeats"),
    )
    top = (
        toks.select("doc_id", F.explode("ts").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_tok_count"))
    )
    return base.join(top, "doc_id").select(
        "doc_id",
        "n_tokens",
        "top_tok_count",
        (F.col("top_tok_count").cast("double") / F.col("n_tokens").cast("double"))
        .alias("top_tok_frac"),
        "n_bigrams",
        (F.col("n_bigrams") - F.col("n_distinct_bigrams")).alias("n_dup_bigrams"),
        (
            (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double")
            / F.nullif(F.col("n_bigrams"), F.lit(0)).cast("double")
        ).alias("dup_bigram_frac"),
        "n_adjacent_repeats",
    )


@register(
    "source_quality_profile",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_tokens_per_doc,
           CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS DOUBLE)
             / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
             AS distinct_token_rate,
           CAST(SUM(len(list_filter(string_split(text, ' '),
                x -> x IN {_STOP_IN}))) AS DOUBLE)
             / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS stopword_rate,
           CAST(SUM(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) AS DOUBLE)
             / CAST(SUM(n_chars) AS DOUBLE) AS punct_rate
    FROM documents
    GROUP BY source
    """,
    tags=("text", "north-star", "quality", "rollup"),
)
def source_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health rollup — the report a pipeline operator
    reads before deciding which sources to keep, reweight, or drop.

    Every rate is a ratio of EXACT integer sums (corpus-level rates, not
    means of per-doc ratios): deterministic under any aggregation order,
    hence bit-identical cross-engine — summing pre-computed doubles would
    be order-dependent. One partial-agg shuffle on source."""
    docs = load_table(spark, "documents", sf_dir)
    per_doc = docs.select(
        "source",
        "n_chars",
        F.size(_tokens()).cast("long").alias("n_tok"),
        F.size(F.array_distinct(_tokens())).cast("long").alias("n_dist"),
        F.expr(f"size(filter(split(text, ' '), x -> x IN {_STOP_IN}))")
        .cast("long")
        .alias("n_stop"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))
        ).cast("long").alias("n_punct"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_tok").cast("double") / F.count("*").cast("double"))
        .alias("avg_tokens_per_doc"),
        (F.sum("n_dist").cast("double") / F.sum("n_tok").cast("double"))
        .alias("distinct_token_rate"),
        (F.sum("n_stop").cast("double") / F.sum("n_tok").cast("double"))
        .alias("stopword_rate"),
        (F.sum("n_punct").cast("double") / F.sum("n_chars").cast("double"))
        .alias("punct_rate"),
    )


@register(
    "inverted_index_postings",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term)
    SELECT term,
           COUNT(*) AS doc_freq,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                      ',' ORDER BY doc_id) AS postings
    FROM tf GROUP BY term HAVING COUNT(*) >= 5
    """,
    tags=("text", "north-star", "index"),
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the exact-match search side of a training
    corpus: term → (doc_freq, total_tf, sorted ``doc:tf`` postings list).
    The classic two-level aggregation: explode → per-(doc, term) tf →
    per-term merge. Both shuffles combine map-side (counts), and the
    postings string is assembled ONCE per term from the sorted struct
    array (the A3 group-concat pattern at term granularity). ``df >= 5``
    bounds the long tail; at 100 TB the posting payload for stop-like
    terms is the skew axis — cap or shard them (same salting pattern as
    ``salted_collect_set``)."""
    docs = load_table(spark, "documents", sf_dir)
    tf = (
        docs.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    posting = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
            lambda s: F.concat_ws(":", s.doc_id, s.tf),
        ),
        ",",
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("tf").alias("total_tf"),
            posting.alias("postings"),
        )
        .filter(F.col("doc_freq") >= 5)
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / CAST(df.df + 1 AS DOUBLE)
               AS score
      FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rnk
      FROM scored)
    SELECT doc_id, term, score, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
    tags=("text", "north-star", "index"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 salient terms by tf-idf with a RECIPROCAL idf
    (``tf * (N+1)/(df+1)``) instead of the log form: same ranking
    monotonicity in 1/df, but integer-derived double division is
    correctly rounded by IEEE in both engines, where ``ln`` is a libm
    call with no cross-engine bit guarantee. Plan: tf agg → broadcast-size
    df table join → window top-k. The df table (distinct terms) is the
    natural broadcast side at any corpus size with a bounded vocabulary."""
    from pyspark.sql.window import Window

    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.count()  # one scalar job; a literal beats a cross-join plan
    tf = (
        docs.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        (
            (F.col("tf") * F.lit(n_docs + 1)).cast("double")
            / (F.col("df") + 1).cast("double")
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "score", "rnk")
    )


CHUNK_TOKENS = 128  # training-window length
CHUNK_STRIDE = 96  # 32-token overlap between consecutive windows


@register(
    "doc_chunk_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents)
    SELECT doc_id,
           CAST(s // {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
           CAST(s AS INTEGER) AS start_token,
           CAST(LEAST({CHUNK_TOKENS}, n - s) AS INTEGER) AS n_tokens
    FROM t, unnest(generate_series(0, n - 1, {CHUNK_STRIDE})) AS u(s)
    """,
    tags=("text", "north-star", "chunking"),
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-length token windows per document — the chunking
    stage in front of tokenize-and-pack for LLM training (windows of
    {CHUNK_TOKENS} tokens, stride {CHUNK_STRIDE}). Pure projection +
    ``sequence``/``explode`` fan-out: no shuffle at all, embarrassingly
    parallel at any corpus size, and chunk ids are content-stable
    (derived from token offsets, not row order)."""
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select(
        "doc_id", F.size(_tokens()).alias("n")
    )
    return t.select(
        "doc_id",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("s"),
    ).select(
        "doc_id",
        (F.col("s") / CHUNK_STRIDE).cast("int").alias("chunk_id"),
        F.col("s").cast("int").alias("start_token"),
        F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("s"))
        .cast("int")
        .alias("n_tokens"),
    )


PACK_CAPACITY = 2048  # tokens per training pack


@register(
    "token_pack_assignment",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
      FROM documents),
    c AS (
      SELECT source, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM t)
    SELECT source, doc_id,
           CAST(n_tok AS BIGINT) AS n_tok,
           CAST(cum_before // {PACK_CAPACITY} AS BIGINT) AS pack_id,
           CAST(cum_before % {PACK_CAPACITY} AS BIGINT) AS offset_in_pack
    FROM c
    """,
    tags=("text", "north-star", "chunking"),
)
def token_pack_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training: lay documents head-to-tail in
    doc_id order within each source shard and assign each to its
    {PACK_CAPACITY}-token pack (pack_id, starting offset). Offset-based
    packing — documents may straddle pack boundaries, as training windows
    cut there anyway — keeps the layout a pure windowed cumsum: one
    shuffle on the shard key, no sequential driver loop, and adding a
    shard never reshuffles the others. (True greedy whole-doc bin packing
    is inherently sequential per shard; the offset layout is the
    distributed-friendly form.)"""
    from pyspark.sql.window import Window

    docs = load_table(spark, "documents", sf_dir)
    t = docs.select("source", "doc_id", F.size(_tokens()).alias("n_tok"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return t.select(
        "source",
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("cum_before"),
    ).select(
        "source",
        "doc_id",
        "n_tok",
        F.expr(f"cum_before div {PACK_CAPACITY}").alias("pack_id"),
        F.pmod("cum_before", F.lit(PACK_CAPACITY)).cast("long").alias("offset_in_pack"),
    )


PARA_TOKENS = 16  # fixed token-window "paragraphs" (corpus has no \n breaks)


@register(
    "paragraph_dedup_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    idx AS (
      SELECT doc_id, toks,
             UNNEST(range(CAST(ceil(len(toks) / {PARA_TOKENS}.0) AS BIGINT))) AS i
      FROM tok),
    para AS (
      SELECT doc_id,
             md5(array_to_string(
                 toks[(i*{PARA_TOKENS}+1):(i*{PARA_TOKENS}+{PARA_TOKENS})], ' ')) AS ph
      FROM idx),
    freq AS (SELECT ph, COUNT(*) AS cnt FROM para GROUP BY ph)
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_paragraphs,
           CAST(SUM(CASE WHEN f.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_paragraphs,
           CAST(SUM(CASE WHEN f.cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_fraction
    FROM para p JOIN freq f ON f.ph = p.ph
    GROUP BY p.doc_id
    """,
    tags=("text", "dedup", "north-star"),
)
def paragraph_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (paragraph-granularity) duplication profile — the
    C4/RefinedWeb-style step that exact doc-level dedup misses: boilerplate
    repeated ACROSS distinct documents. Documents are chunked into fixed
    {PARA_TOKENS}-token windows (this corpus has no newline paragraph
    breaks), each window md5-fingerprinted, and every doc reports how many
    of its windows occur more than once corpus-wide.

    Shape: chunking is a map-side transform+explode (no UDF), then ONE
    shuffle builds the global fingerprint frequency table, a fingerprint-
    keyed join (both sides arrive hash-partitioned by ph — exchange
    reuse), and a doc-keyed rollup. At 100 TB the frequency table is the
    small side (distinct fingerprints ≪ total windows under heavy dup) —
    AQE will broadcast it when it fits."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split("text", " ")
    chunk_hashes = F.expr(
        f"transform(sequence(0, cast(ceil(size(split(text, ' ')) / {PARA_TOKENS}.0)"
        f" as int) - 1),"
        f" i -> md5(concat_ws(' ', slice(split(text, ' '), i*{PARA_TOKENS}+1, {PARA_TOKENS}))))"
    )
    para = docs.select("doc_id", F.explode(chunk_hashes).alias("ph"))
    freq = para.groupBy("ph").agg(F.count("*").alias("cnt"))
    return (
        para.join(freq, "ph")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_paragraphs"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_paragraphs"),
            (
                F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).cast("double")
                / F.count("*").cast("double")
            ).alias("dup_fraction"),
        )
    )


# Feature hashing (the "hashing trick"): fixed-width signed bag-of-words.
FH_DIM = 32


@register(
    "text_feature_hashing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
      FROM documents),
    hashed AS (
      SELECT doc_id,
             (('0x' || substring(md5('f:' || token), 1, 7))::BIGINT
                % {FH_DIM}) AS bucket,
             CASE WHEN ('0x' || substring(md5('s:' || token), 1, 7))::BIGINT
                       % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM toks),
    cells AS (
      SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS v
      FROM hashed GROUP BY 1, 2),
    grid AS (
      SELECT d.doc_id, g.b
      FROM (SELECT DISTINCT doc_id FROM documents) d
      CROSS JOIN (SELECT UNNEST(generate_series(0, {FH_DIM - 1})) AS b) g)
    SELECT g.doc_id,
           string_agg(CAST(COALESCE(c.v, 0) AS VARCHAR), ',' ORDER BY g.b)
             AS fvec,
           CAST(SUM(ABS(COALESCE(c.v, 0))) AS BIGINT) AS l1,
           CAST(SUM(CASE WHEN COALESCE(c.v, 0) <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS nnz
    FROM grid g
    LEFT JOIN cells c ON c.doc_id = g.doc_id AND c.bucket = g.b
    GROUP BY g.doc_id
    """,
    tags=("text", "north-star", "features"),
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (Weinberger et al.): every document's bag of words
    folded into a FIXED {FH_DIM}-wide signed count vector — token →
    md5 bucket, ±1 sign from an independent md5 bit (the sign trick makes
    collisions cancel in expectation instead of biasing upward). The
    vocabulary-free featurizer for training-data pipelines: no dictionary
    build, no OOV, identical vector for the same text on any engine (all
    integer arithmetic — the whole vector hash-matches the oracle).

    Shape at scale: explode → one map-side-combining (doc, bucket) sum →
    one (doc) rollup that densifies via a constant-width map transform;
    output width is {FH_DIM} regardless of vocabulary or corpus size."""
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("f:"), F.col("token"))), 1, 7), 16, 10
        ).cast("bigint"),
        F.lit(FH_DIM),
    )
    sgn = F.when(
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit("s:"), F.col("token"))), 1, 7),
                16,
                10,
            ).cast("bigint"),
            F.lit(2),
        )
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    cells = (
        tok.select("doc_id", bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").cast("long").alias("v"))
    )
    dense = cells.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "v"))
        ).alias("m")
    )
    return dense.select(
        "doc_id",
        F.array_join(
            F.expr(
                f"transform(transform(sequence(0, {FH_DIM - 1}),"
                f" b -> coalesce(m[cast(b as bigint)], 0L)),"
                " v -> cast(v as string))"
            ),
            ",",
        ).alias("fvec"),
        F.expr(
            f"aggregate(transform(sequence(0, {FH_DIM - 1}),"
            f" b -> coalesce(m[cast(b as bigint)], 0L)),"
            " 0L, (acc, v) -> acc + abs(v))"
        ).alias("l1"),
        F.expr(
            f"cast(size(filter(transform(sequence(0, {FH_DIM - 1}),"
            f" b -> coalesce(m[cast(b as bigint)], 0L)),"
            " v -> v != 0)) as bigint)"
        ).alias("nnz"),
    )


@register(
    "lang_id_confusion",
    oracle=f"""
    WITH pred AS (
      SELECT lang AS true_lang, {_guess_sql()} AS pred_lang
      FROM documents),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM documents)
    SELECT p.true_lang, p.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN p.true_lang = p.pred_lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(COUNT(*) AS DOUBLE) / CAST(ANY_VALUE(n.total) AS DOUBLE)
             AS cell_fraction
    FROM pred p CROSS JOIN n
    GROUP BY p.true_lang, p.pred_lang
    """,
    tags=("text", "north-star", "lang", "audit"),
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-eval audit for the language-ID heuristic: the full confusion
    matrix of predicted vs labeled language (one row per cell, with the
    corpus-fraction column a dashboard plots directly). The per-class
    diagonal/off-diagonal split is the routing signal every multilingual
    pipeline needs before trusting lang filters — and because the
    predictor is the SAME deterministic expression as
    ``lang_id_heuristic``, the entire evaluation hash-matches the oracle.

    One conditional-aggregation pass over the doc table (the prediction
    is a projection, not a model call), one (true, pred) rollup of at
    most |langs|² cells, 1-row total frame on a cross join."""
    docs = load_table(spark, "documents", sf_dir)
    guess = _guess_col()
    n = docs.agg(F.count("*").cast("long").alias("total"))
    return (
        docs.select(F.col("lang").alias("true_lang"), guess.alias("pred_lang"))
        .crossJoin(F.broadcast(n))
        .groupBy("true_lang", "pred_lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("true_lang") == F.col("pred_lang"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
            (
                F.count("*").cast("double") / F.any_value("total").cast("double")
            ).alias("cell_fraction"),
        )
    )


# --- BPE merge induction (r05 session 3) -----------------------------------

BPE_TOPK = 20


@register(
    "bpe_merge_candidates",
    oracle=f"""
    WITH words AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE length(w) >= 2
      GROUP BY w),
    pairs AS (
      SELECT w, substring(w, i, 2) AS pair, freq
      FROM words, LATERAL (
        SELECT unnest(generate_series(1, length(w) - 1)) AS i) s),
    counts AS (
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT w) AS BIGINT) AS n_vocab_words
      FROM pairs GROUP BY pair)
    SELECT pair, n_occurrences, n_vocab_words
    FROM counts
    ORDER BY n_occurrences DESC, pair
    LIMIT {BPE_TOPK}
    """,
    tags=("text", "north-star", "tokens", "bpe"),
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE ROUND of BPE vocabulary induction (Sennrich et al. 2016): the
    corpus-weighted adjacent-symbol-pair counts whose argmax is the next
    merge rule — the training half of the tokenizer whose inference half
    is ``token_count_bpe``. Full BPE iterates this with re-segmentation;
    the relational unit is one counting round, and THE scalable trick is
    in the shape: pairs are extracted over the DISTINCT-WORD vocabulary
    (thousands of rows) and weighted by word frequency, never over the
    corpus token stream (billions) — the same vocab-vs-stream asymmetry
    every production BPE trainer exploits.

    Plan: one map-side-combining shuffle for word frequencies, a
    sequence-explode over the vocab, one pair rollup, and a {BPE_TOPK}-row
    TakeOrdered. Ties broken by pair string for a deterministic top-k."""
    docs = load_table(spark, "documents", sf_dir)
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    pairs = words.select(
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        "w",
    ).select(
        "w", F.substring("w", F.col("i"), F.lit(2)).alias("pair"), "freq"
    )
    # n_vocab_words = DISTINCT words containing the pair (a word holding
    # the pair at two offsets counts once — what the column name promises;
    # a plain COUNT(*) would count positions)
    counts = pairs.groupBy("pair").agg(
        F.sum("freq").cast("long").alias("n_occurrences"),
        F.countDistinct("w").cast("long").alias("n_vocab_words"),
    )
    return counts.orderBy(
        F.col("n_occurrences").desc(), F.col("pair")
    ).limit(BPE_TOPK)


SCRUB_MAX_FREQ = 1  # a window seen in >1 place corpus-wide is boilerplate


@register(
    "paragraph_scrub_rebuild",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    chunks AS (
      SELECT doc_id, i AS pos,
             array_to_string(
               t[(i*{PARA_TOKENS}+1):(i*{PARA_TOKENS}+{PARA_TOKENS})], ' ') AS chunk
      FROM toks, LATERAL (
        SELECT UNNEST(range(CAST(ceil(len(t) / {PARA_TOKENS}.0) AS BIGINT))) AS i) s),
    freq AS (SELECT md5(chunk) AS ph, COUNT(*) AS cnt
             FROM chunks GROUP BY 1),
    graded AS (
      SELECT c.doc_id, c.pos, c.chunk, f.cnt
      FROM chunks c JOIN freq f ON f.ph = md5(c.chunk))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_paragraphs,
           CAST(SUM(CASE WHEN cnt <= {SCRUB_MAX_FREQ} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           COALESCE(string_agg(
             CASE WHEN cnt <= {SCRUB_MAX_FREQ} THEN chunk END, ' '
             ORDER BY pos), '') AS scrubbed_text
    FROM graded GROUP BY doc_id
    """,
    tags=("text", "north-star", "dedup", "transform"),
)
def paragraph_scrub_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRANSFORM counterpart of ``paragraph_dedup_stats`` — the
    C4/RefinedWeb scrub step that actually EMITS cleaned text: every
    {PARA_TOKENS}-token window seen more than {SCRUB_MAX_FREQ} time(s)
    corpus-wide is dropped, the survivors are reassembled IN ORDER into
    ``scrubbed_text`` (empty string when everything was boilerplate — the
    caller's drop signal). The whole rebuilt string is value-hashed
    against the oracle, so the reassembly order and joining are verified
    byte-for-byte, not just counted.

    Plan shape: chunk explode (map-side), ONE fingerprint-frequency
    shuffle, a fingerprint join (AQE broadcasts the frequency table when
    it fits), then a doc-keyed rollup where collect_list(when(...))
    drops boilerplate windows null-wise and array_sort on (pos, chunk)
    structs restores document order without a window function."""
    docs = load_table(spark, "documents", sf_dir)
    chunk_arr = F.expr(
        f"transform(sequence(0, cast(ceil(size(split(text, ' ')) / {PARA_TOKENS}.0)"
        f" as int) - 1),"
        f" i -> concat_ws(' ', slice(split(text, ' '), i*{PARA_TOKENS}+1, {PARA_TOKENS})))"
    )
    chunks = docs.select(
        "doc_id", F.posexplode(chunk_arr).alias("pos", "chunk")
    ).withColumn("ph", F.md5("chunk"))
    freq = chunks.groupBy("ph").agg(F.count("*").alias("cnt"))
    keep = F.col("cnt") <= SCRUB_MAX_FREQ
    return (
        chunks.join(freq, "ph")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_paragraphs"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("pos", "chunk")))
                    ),
                    lambda x: x["chunk"],
                ),
            ).alias("scrubbed_text"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM rarity score (r06): the CCNet-style LM quality filter shape
# ---------------------------------------------------------------------------

RARITY_SCALE = 1_000_000_000  # integer surprisal unit: floor(SCALE / df)


@register(
    "doc_rarity_scores",
    oracle=f"""
    WITH types AS MATERIALIZED (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
      FROM documents),
    df AS (SELECT word, COUNT(*) AS df FROM types GROUP BY word)
    SELECT t.doc_id,
           COUNT(*) AS n_types,
           CAST(SUM({RARITY_SCALE} // df.df) AS BIGINT) AS rarity_score
    FROM types t JOIN df ON df.word = t.word
    GROUP BY t.doc_id
    """,
    tags=("text", "north-star", "quality", "lm-score"),
)
def doc_rarity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM rarity scoring — the integer-exact stand-in for the
    perplexity filter every LLM corpus pipeline runs (CCNet trains a LM and
    buckets documents by score; here the LM is the corpus's own unigram
    document-frequency table and the per-document score is
    sum(floor(SCALE / df(word))) over the document's DISTINCT words:
    monotone in word rarity, all-integer so both engines agree bit-for-bit
    (float log/exp are NOT portable cross-engine; an integer surprisal
    proxy ranks documents the same way).

    Oracle dtype note (r06 driver finding): DuckDB types SUM(BIGINT) as
    HUGEINT, which pandas renders as float64 while Spark emits int64 —
    numerically equal but hash-divergent under the driver's
    representation-sensitive value hash. The oracle therefore CASTs the
    SUM back to BIGINT; ``tools/check_correctness.py`` now enforces
    dtype-kind equality so this class of bug fails locally too.

    Scale posture: the df table is one map-side-combining groupBy over
    (doc, word) pairs; the score join fans each distinct word back to its
    docs — shuffle keyed on word, where stopword keys are hot but each
    carries only an 8-byte df, and AQE splits skewed reduce partitions;
    the final per-doc sum combines map-side. At 100 TB the df table is a
    reusable silver artifact (computed once per corpus snapshot), exactly
    like the real pipeline's trained LM."""
    docs = load_table(spark, "documents", sf_dir)
    types = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("word"),
    )
    df = types.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    return (
        types.join(df, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.expr(f"{RARITY_SCALE} div df")).alias("rarity_score"),
        )
    )
