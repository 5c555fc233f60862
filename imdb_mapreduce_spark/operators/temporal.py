"""Temporal join operators Spark lacks as builtins: AS-OF join and range
(band) join — composed from existing DataFrame ops, per the engine's
custom-operator policy (composition first, Pandas-UDF only if semantics
demand it; these don't).

AS-OF join (``asof_join``): for each left row, the single most recent right
row with key equality and right.ts <= left.ts. Implemented with the
union + last(ignorenulls) window trick:

  1. tag both inputs and union them on (key, ts);
  2. one window per key ordered by (ts, tag, payload-struct) carries the
     most recent right ROW forward as a single non-null struct with
     ``last(..., ignorenulls=True)``;
  3. keep left rows and unpack the struct.

All payload columns travel together in ONE struct, so they always come
from the same matched right row and genuinely-NULL payload values survive
(carrying each column independently would let a NULL in the latest match
fall back to an older row — DuckDB ASOF JOIN / pandas merge_asof return
the matched row's values, NULLs included). Duplicate (key, ts) right rows
tie-break deterministically on the payload struct itself (maximum wins),
independent of partitioning.

One shuffle on the key, no range-duplicating self-join, no per-row Python —
the scalable shape (a sort-merge AS-OF, as native engines implement it,
falls out of the window's sort). Right-side payloads travel through the
window, so wide right sides should be pruned to needed columns first.

Range join (``band_join``): non-equi join against a (usually tiny) interval
table — broadcast the bands and let the nested-loop join run per-partition;
with band count ≪ rows this is a map-side operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: latest ``right`` row with same ``key`` and
    right.ts <= left.ts (ties: right row wins — it is 'already known' at
    that instant). Left rows with no prior right row keep NULL payloads.
    All payload columns come from the SAME matched right row; duplicate
    (key, ts) right rows tie-break on the maximum payload struct.

    Requires every payload column to be orderable (the deterministic
    tie-break sorts the whole payload struct): map-typed payload columns
    fail analysis. If you need to carry a map, wrap it — e.g. pass
    ``map_entries(m)`` (an orderable array<struct>) and rebuild with
    ``map_from_entries`` after the join.
    """
    from pyspark.sql import types as T

    lcols = left.columns
    struct_t = T.StructType([right.schema[p] for p in payload])
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(struct_t).alias("_r"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(p) for p in payload]).alias("_r"),
    )
    # align schemas: left extra columns become NULL on the right side
    for c in lcols:
        if c not in (key, ts):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols, "_side", F.last("_r", ignorenulls=True).over(w).alias("_m")
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col("_m").getField(p).alias(f"{p}{suffix}") for p in payload],
    )


def band_join(
    facts: DataFrame, bands: DataFrame, value: str, lo: str = "lo", hi: str = "hi"
) -> DataFrame:
    """Join each fact row to the band with lo <= value < hi. ``bands`` is
    broadcast (interval tables are small by nature); the non-equi predicate
    runs as a per-partition loop over the handful of bands."""
    return facts.join(
        F.broadcast(bands),
        (F.col(value) >= F.col(lo)) & (F.col(value) < F.col(hi)),
        "inner",
    )
