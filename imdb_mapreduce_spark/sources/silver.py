"""Build-once materialized ("silver") tables keyed by source fingerprint.

The medallion-architecture move: expensive derived datasets (near-dup
cluster maps, ANN index layouts, signature tables) are written ONCE per
source-data version and every consumer afterwards is a pure parquet read.
At 100 TB this is the difference between a dedup pipeline that runs once
per corpus snapshot and one that re-shingles the corpus every time a
downstream query wants the cluster map.

Staleness safety (the r03 lesson — never trust persisted state across a
driver-side data regeneration): the materialization is keyed by the source
parquet's (path, mtime_ns, size) plus the build parameters; any change
rebuilds automatically, so a consumer can never read a silver table that
disagrees with its source.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def silver_root() -> str:
    return os.path.join(_REPO, "spark-warehouse", "silver")


def materialized(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    src_table: str,
    params: dict,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the silver table ``name`` derived from ``src_table`` at
    ``sf_dir``, building it with ``build()`` iff absent or stale.

    ``params`` must include every knob the build depends on — it is part
    of the staleness key, so changing a threshold invalidates the table.
    """
    src = os.path.join(sf_dir, f"{src_table}.parquet")
    st = os.stat(src)
    fingerprint = {
        "src": src,
        "mtime_ns": st.st_mtime_ns,
        "size": st.st_size,
        **params,
    }
    base = os.path.join(silver_root(), os.path.basename(sf_dir.rstrip("/")), name)
    data_dir = os.path.join(base, "data")
    meta_path = os.path.join(base, "_meta.json")
    # Reuse only when the fingerprint matches AND the data directory holds a
    # completed Spark write (_SUCCESS): a crash between the data write and
    # the meta write, or an externally deleted data dir, must rebuild rather
    # than fail the read. Torn meta (partial JSON) likewise falls through.
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                stored = json.load(f)
        except (json.JSONDecodeError, OSError):
            stored = None
        if stored == fingerprint and os.path.exists(
            os.path.join(data_dir, "_SUCCESS")
        ):
            return spark.read.parquet(data_dir)
    build().write.mode("overwrite").parquet(data_dir)
    # Meta is written AFTER the data and atomically (temp + rename), so a
    # reader can never observe a fingerprint that vouches for missing or
    # half-written data.
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(fingerprint, f)
    os.replace(tmp, meta_path)
    return spark.read.parquet(data_dir)


def cached_query_result(
    spark: SparkSession, sf_dir: str, name: str, tables: tuple[str, ...] = ()
) -> DataFrame:
    """Materialized RESULT CACHE for any registered query: the first call
    computes the query and writes its result as a silver parquet table;
    every later call is a pure parquet read — until any source table's
    (path, mtime, size) changes, which rebuilds automatically.

    The fingerprint covers every table the query reads (``tables``;
    defaults to all star tables when unspecified — correct but coarser
    invalidation) plus the query name. This is the engine-service form of
    result caching: unlike ``df.cache()`` it survives the session, is
    shared across processes, and can never serve a result that disagrees
    with its inputs (the r03 staleness lesson, generalized from the
    cluster-map and IVF-index materializations to the whole registry)."""
    from imdb_mapreduce_spark.plans.registry import all_queries
    from imdb_mapreduce_spark.sources.star import TABLES

    q = all_queries()[name]
    deps = tables or tuple(TABLES)
    stats = {}
    for t in deps:
        p = os.path.join(sf_dir, f"{t}.parquet")
        st = os.stat(p)
        stats[t] = [st.st_mtime_ns, st.st_size]
    # reuse materialized()'s fingerprint/atomicity machinery; the first
    # dep stands as src_table and the rest ride in params
    return materialized(
        spark,
        sf_dir,
        f"result__{name}",
        deps[0],
        {"query": name, "deps": stats},
        lambda: q.spark_fn(spark, sf_dir),
    )
