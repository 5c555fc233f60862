"""Interleaved A/B: overlap ann_ivf_erasure_topk's probe leg with the
index-write/delete chain (r16 opt session 2, guide §2.6).

The query runs ~8 serial driver actions: index write → touched collect →
repaired pin → present collect → overwrite → probes pin → probe-cells
collect → final pin. The PROBE leg (probes pin + probe-cells collect)
reads only the embeddings table and the stateless quantizer — never the
index directories — so it can run on a driver thread concurrently with
the index write + delete-in-place, the same overlap pattern as
`_coarse_tiers`' 3-wide tier materializer.

Both arms collect the full result and must match row-for-row (the probe
leg's inputs are untouched by the delete, so this is an ordering-free
set equality on the final top-k rows).

Usage: python tools/ivf_overlap_ab.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from imdb_mapreduce_spark.pipeline.similarity import (  # noqa: E402
    IVF_DET_NPROBE,
    N_QUERIES,
    TOP_K,
    _ERASED_VEC_SQL,
    _assigned_cells,
    _ivf_det_ranked,
    dot,
    ivf_delete_in_place,
    ivf_det_pivots,
    norm,
)
from imdb_mapreduce_spark.session import get_spark  # noqa: E402
from imdb_mapreduce_spark.sources.star import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def run(spark, overlapped: bool):
    emb = load_table(spark, "embeddings", SF_DIR)
    pivots = ivf_det_pivots(spark, SF_DIR)
    with tempfile.TemporaryDirectory() as d:
        cells_dir = os.path.join(d, "cells")

        def probe_leg():
            ranked = _ivf_det_ranked(pivots)
            probes = (
                emb.filter(
                    (F.col("vec_id") < N_QUERIES) & ~F.expr(_ERASED_VEC_SQL)
                )
                .select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qe"),
                    norm("embedding").alias("qn"),
                    F.explode(F.slice(ranked, 1, IVF_DET_NPROBE)).alias("pr"),
                )
                .select(
                    "query_id", "qe", "qn", F.col("pr.cell").alias("cell")
                )
                .localCheckpoint(eager=True)
            )
            cells = sorted(
                int(r["cell"])
                for r in probes.select("cell").distinct().collect()
            )
            return probes, cells

        def index_leg():
            _assigned_cells(emb, pivots).write.partitionBy("cell").parquet(
                cells_dir
            )
            erased = emb.filter(F.expr(_ERASED_VEC_SQL)).select(
                "vec_id", "embedding"
            )
            ivf_delete_in_place(spark, cells_dir, erased, pivots)

        if overlapped:
            with ThreadPoolExecutor(max_workers=1) as pool:
                fut = pool.submit(probe_leg)
                index_leg()
                probes, probe_cells = fut.result()
        else:
            index_leg()
            probes, probe_cells = probe_leg()

        idx = (
            spark.read.parquet(cells_dir)
            .filter(F.col("cell").isin(probe_cells))
            .select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ce"),
                "cell",
                norm("embedding").alias("cn"),
            )
        )
        scored = (
            F.broadcast(probes)
            .join(idx, "cell")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                (dot("qe", "ce") / (F.col("qn") * F.col("cn"))).alias(
                    "cosine"
                ),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        out = (
            scored.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= TOP_K)
            .select("query_id", "neighbor_id", "cosine", "rnk")
        )
        return out.localCheckpoint(eager=True).collect()


def main() -> None:
    spark = get_spark("ivf-overlap-ab")
    spark.range(1).count()
    # warm both arms once (untimed)
    base = sorted(map(tuple, run(spark, False)))
    over = sorted(map(tuple, run(spark, True)))
    assert base == over, "arms diverge"
    res: dict[str, list[float]] = {"serial": [], "overlap": []}
    for _ in range(REPS):
        for arm, flag in (("serial", False), ("overlap", True)):
            t = time.monotonic()
            rows = run(spark, flag)
            res[arm].append(round(time.monotonic() - t, 3))
            assert sorted(map(tuple, rows)) == base
    for arm, xs in res.items():
        print(
            f"{arm:8s} min={min(xs):.3f} med={sorted(xs)[len(xs) // 2]:.3f} "
            f"{xs}"
        )


if __name__ == "__main__":
    main()
