"""Cross-engine numeric parity helpers.

Spark and DuckDB both use IEEE binary64, but a parallel engine sums
partitions in nondeterministic order — so ``SUM(double)`` can differ in the
last ulp between engines (and between runs). The driver's correctness gate
hashes values exactly, so "close" is not "equal".

Fix: do additive aggregation in DECIMAL (exact, order-independent), cast the
final result back to DOUBLE. Rounding a finite double to DECIMAL(38,6) is a
deterministic function of the value in both engines (ties at the 7th decimal
require the double to be exactly k/2·10⁻⁶, which only dyadic rationals hit),
so both engines see identical decimal inputs, identical exact sums, and an
identical final double.

This is not just a test trick — it is the right 100 TB posture too: money
columns aggregated across millions of partitions should not produce
run-to-run-different totals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"  # enough integer headroom for sf≫1 sums
_SQL_DEC = "DECIMAL(38,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM over a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """AVG as exact-decimal sum divided by count, in double — both engines
    perform the identical single double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(DEC)).cast("double") / F.count(c).cast("double")
    ).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {_SQL_DEC})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS {_SQL_DEC})) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE) AS {alias}"
    )


def int_csv(col: Column | str, alias: str) -> Column:
    """Sorted comma-joined rendering of a collected integer set — the
    cross-engine-stable way to emit an adjacency list (SURVEY.md A1/A2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(
        F.transform(F.array_sort(F.collect_set(c)), lambda x: x.cast("string")), ","
    ).alias(alias)


def str_csv(col: Column | str, alias: str) -> Column:
    """Sorted comma-joined rendering of a collected string set."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_sort(F.collect_set(c)), ",").alias(alias)
