"""Declarative readers for the IMDb TSV inputs (SURVEY.md §2.1 S1-S5).

The reference parses these files positionally, line-by-line, scattering each
line over the wire (``/root/reference/src/master/dataInit.erl:151-158``,
``src/server/server.erl:261-282``). Here the whole ingest is a schema'd
``spark.read.csv``: the ``\\N`` NULL sentinel, header handling, and typed
columns are declared once and handled by the vectorized reader.

Intentional divergences from reference bugs (documented per SURVEY.md §7
phase 0):
- the names file has NO header, yet the reference skips its first line
  (``dataInit.erl:83-84``), silently dropping one person — we read every row;
- years/runtime parse as nullable ints instead of flowing through as the
  literal string ``\\N``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Raw file schemas: columns exactly as they appear in the TSVs
# (/root/reference/README.md:62-89; FIXTURES.md §A).
TITLES_RAW_SCHEMA = StructType(
    [
        StructField("tconst", StringType()),
        StructField("titleType", StringType()),
        StructField("primaryTitle", StringType()),
        StructField("originalTitle", StringType()),
        StructField("isAdult", IntegerType()),
        StructField("startYear", IntegerType()),
        StructField("endYear", IntegerType()),
        StructField("runtimeMinutes", IntegerType()),
        StructField("genres", StringType()),
    ]
)

PRINCIPALS_RAW_SCHEMA = StructType(
    [
        StructField("tconst", StringType()),
        StructField("ordering", IntegerType()),
        StructField("nconst", StringType()),
        StructField("category", StringType()),
        StructField("job", StringType()),
        StructField("characters", StringType()),
    ]
)

NAMES_RAW_SCHEMA = StructType(
    [
        StructField("nconst", StringType()),
        StructField("primaryName", StringType()),
        StructField("birthYear", IntegerType()),
        StructField("deathYear", IntegerType()),
        StructField("primaryProfession", StringType()),
        StructField("knownForTitles", StringType()),
    ]
)


def _tsv(spark: SparkSession, path: str, schema: StructType, header: bool) -> DataFrame:
    return (
        spark.read.options(
            sep="\t",
            header=str(header).lower(),
            nullValue="\\N",
            mode="PERMISSIVE",
        )
        .schema(schema)
        .csv(path)
    )


def _id_to_int(col: str) -> "F.Column":
    """Strip the 2-char ``tt``/``nm`` prefix and parse the rest as long
    (a 32-bit cast would NULL 10-digit ids and silently drop the row in
    downstream inner joins; current IMDb ids are 8 digits, but the failure
    mode is silent data loss).

    Mirrors ``string:to_integer(string:sub_string(S, 3))`` at
    ``/root/reference/src/server/server.erl:263`` (scalar function X2).
    """
    return F.substring(F.col(col), 3, 16).cast("long")


def read_titles_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Typed titles table (operator S2 + projection F1 + scalars X1-X3)."""
    raw = _tsv(spark, path, TITLES_RAW_SCHEMA, header=True)
    return raw.select(
        _id_to_int("tconst").alias("tconst"),
        F.col("titleType").alias("title_type"),
        F.col("primaryTitle").alias("primary_title"),
        F.col("originalTitle").alias("original_title"),
        (F.col("isAdult") == 1).alias("is_adult"),
        F.col("startYear").alias("start_year"),
        F.col("endYear").alias("end_year"),
        F.col("runtimeMinutes").alias("runtime_min"),
        F.transform(F.split("genres", ","), lambda g: F.trim(g)).alias("genres"),
    )


def read_principals_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Typed principals table (operator S3 + projection F2)."""
    raw = _tsv(spark, path, PRINCIPALS_RAW_SCHEMA, header=True)
    return raw.select(
        _id_to_int("tconst").alias("tconst"),
        F.col("ordering"),
        _id_to_int("nconst").alias("nconst"),
        F.col("category"),
    )


def read_names_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Typed names table (operator S1 + projection F3).

    header=False: the sample names file has no header row; the reference's
    unconditional first-line skip (``dataInit.erl:83-84``) is a bug we do
    not replicate.
    """
    raw = _tsv(spark, path, NAMES_RAW_SCHEMA, header=False)
    return raw.select(
        _id_to_int("nconst").alias("nconst"),
        F.col("primaryName").alias("primary_name"),
        F.col("birthYear").alias("birth_year"),
        F.col("deathYear").alias("death_year"),
        F.split("primaryProfession", ",").alias("professions"),
        F.transform(
            F.split("knownForTitles", ","), lambda t: F.substring(t, 3, 16).cast("long")
        ).alias("known_for"),
    )


def read_prejoined_csv(spark: SparkSession, path: str) -> DataFrame:
    """The step0 pre-joined input (operator S4): ``title\\tname1,name2,...``.

    Mirrors ``/root/reference/src/master/dataInit.erl:32-43`` /
    ``src/server/server.erl:111-124``: one row per title with a comma-packed
    cast, immediately normalized back to an array.
    """
    schema = StructType(
        [StructField("title", StringType()), StructField("cast_csv", StringType())]
    )
    raw = _tsv(spark, path, schema, header=True)
    return raw.select(
        F.col("title"), F.split("cast_csv", ",\\s*").alias("cast")
    )
