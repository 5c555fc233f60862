"""Reusable column-function library — the engine's scalar-function surface.

The reference's complete scalar inventory (SURVEY.md §2.3 X1-X9) as named,
composable Column builders, plus the skew-handling aggregation helpers the
100 TB posture calls for. Everything is built-in-function composition:
whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# -- the reference's scalar surface (X1-X6) ---------------------------------


def split_list(col: Column | str, sep: str = ",") -> Column:
    """X1 — delimiter split to array (``string:split``)."""
    return F.split(col if isinstance(col, Column) else F.col(col), sep)


def strip_id_prefix(col: Column | str) -> Column:
    """X2 — drop the 2-char ``tt``/``nm`` prefix, parse long
    (``string:to_integer(string:sub_string(S, 3))``, server.erl:263)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.substring(c, 3, 16).cast("long")


def trimmed(col: Column | str) -> Column:
    """X3 — whitespace trim."""
    return F.trim(col if isinstance(col, Column) else F.col(col))


def joined(col: Column | str, sep: str = ", ") -> Column:
    """X4 — array → delimited string (``string:join``)."""
    return F.array_join(col if isinstance(col, Column) else F.col(col), sep)


def sanitized_identifier(col: Column | str) -> Column:
    """X5 — non-alphanumerics → ``_`` for DOT/identifier use. Uses the
    corrected class ``[^A-Za-z0-9]`` (the reference omits ``0``,
    graph.erl:30)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.regexp_replace(c, "[^A-Za-z0-9]", "_")


def last_token(col: Column | str, sep: str = " ") -> Column:
    """X6 — last delimited token (the surname sort key, graph.erl:95-97)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.element_at(F.split(c, sep), -1)


def bucket_of(col: Column | str, n: int) -> Column:
    """X7 — stable hash bucket in [0, n) (``erlang:phash2(Key, N)`` analog;
    P1's hash-partitioner as an expression). ``pmod`` keeps negatives out."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.pmod(F.hash(c), F.lit(n))


# -- skew-safe aggregation (the SCALE.md salting pattern) -------------------


def salted_collect_set(
    df: DataFrame, key: str, value: str, out: str, salt_buckets: int = 16
) -> DataFrame:
    """``groupBy(key).agg(collect_set(value))`` for skewed keys.

    Two-phase: collect within (key, salt) buckets first — bounding any
    single task's state to |key|/buckets — then merge bucket arrays per
    key. Same result as the direct aggregate (sorted), but no task ever
    materializes a whole pathological key.
    """
    salted = df.withColumn("_salt", F.pmod(F.hash(F.col(value)), F.lit(salt_buckets)))
    partial = salted.groupBy(key, "_salt").agg(
        F.collect_set(value).alias("_partial")
    )
    return partial.groupBy(key).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("_partial")))
        ).alias(out)
    )
