"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the
[NORTH-STAR] pipeline operators), one callable per name.
``oracle_sql()`` — equivalent DuckDB SQL for each SQL-expressible query.

All three delegate to the package's query registry
(``imdb_mapreduce_spark/plans/registry.py``); query implementations live in
``imdb_mapreduce_spark/plans/*`` and ``imdb_mapreduce_spark/pipeline/*``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from imdb_mapreduce_spark.plans.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The TPC-H-Q1-shaped scan→filter→aggregate pipeline (pricing_summary):
    exercises pushdown, partial aggregation, and exact-decimal money math.
    """
    q = all_queries()["pricing_summary"]
    return q.spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
