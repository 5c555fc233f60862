"""Dump the formatted physical plan of any registered query.

Usage:  python tools/explain_query.py <query_name> [sf_dir]

The fast way to audit a plan for the things SCALE.md promises: pushed
filters, pruned columns, broadcast vs shuffle joins, partial aggregation,
WholeStageCodegen spans, PartitionFilters.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        from imdb_mapreduce_spark.plans.registry import all_queries

        print(__doc__)
        print("registered queries:")
        for name in all_queries():
            print(" ", name)
        return
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from imdb_mapreduce_spark.plans.registry import all_queries
    from imdb_mapreduce_spark.session import get_spark

    q = all_queries()[name]
    spark = get_spark("explain")
    q.spark_fn(spark, sf_dir).explain("formatted")


if __name__ == "__main__":
    main()
