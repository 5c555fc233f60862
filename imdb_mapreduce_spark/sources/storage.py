"""Silver-layer storage layouts (the at-rest half of the 100 TB story).

Two mechanisms, both exercised by tests/test_storage.py:

- **Bucketing**: persist a table pre-hashed on its join/group key so
  repeated joins and aggregations on that key run WITHOUT a shuffle
  (SortMergeJoin/HashAggregate read the bucketed layout directly). This is
  the durable version of the reference's co-partitioning-by-tconst
  (SURVEY.md §2.2 note).
- **Partitioning**: directory-partition facts on a low-cardinality derived
  key (e.g. event date) so date-range predicates prune entire directories
  before any I/O (PartitionFilters, not just PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8
) -> None:
    """Persist hash-bucketed + sorted by ``key`` into the session catalog
    (overwrites). Also clears any orphaned warehouse directory: the
    default catalog is per-session in-memory, so a table dir left by a
    previous session would collide with the fresh CREATE."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if warehouse:
        shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", date_col: str = "event_date"
) -> None:
    """Persist partitioned by the DATE of ``ts_col`` (directory per day)."""
    (
        df.withColumn(date_col, F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy(date_col)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
