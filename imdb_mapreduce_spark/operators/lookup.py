"""Point-lookup query operators (SURVEY.md §2.8, Q1/Q2).

The reference serves a keyed lookup per request: ``ets:lookup`` on each
worker, scatter-gather broadcast from the master, flatten + dedup
(``/root/reference/src/server/server.erl:313-317``,
``src/master/master.erl:233-242,314-318``). In Spark a filter on a
partitioned DataFrame already runs on every partition, and ``distinct()``
is the gather-side dedup (A4) — the whole scatter-gather protocol is one
declarative expression.

At 100 TB / interactive latency: keep the edge table cached (or stored
partitioned/bucketed and z-ordered by the lookup key) so the filter prunes
files instead of scanning; the operator code does not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cast_of(cast_edges: DataFrame, title: str) -> DataFrame:
    """Actors of a title — sorted, deduped (Q1 keyed by title)."""
    return (
        cast_edges.filter(F.col("title") == F.lit(title))
        .select("actor")
        .distinct()
        .orderBy("actor")
    )


def movies_of(cast_edges: DataFrame, actor: str) -> DataFrame:
    """Titles of an actor — sorted, deduped (Q1 keyed by actor).

    Note the reference keys actors by display name, so namesakes merge
    (``server.erl:119-121``) — a documented data-model hazard we preserve
    at the API level (lookup by name) while keeping ``tconst`` available
    for disambiguation in the edge table.
    """
    return (
        cast_edges.filter(F.col("actor") == F.lit(actor))
        .select("title")
        .distinct()
        .orderBy("title")
    )
