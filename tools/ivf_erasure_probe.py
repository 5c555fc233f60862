"""IVF index-erasure probe (r15, VERDICT r14 item 7): delete-in-place
vs full index rebuild, measured at synthetic decades.

`ivf_delete_in_place` claims deletion cost proportional to the erased
set's CELL footprint (recompute the erased rows' owning cells from the
stateless quantizer, rewrite only those ``cell=<i>`` directories) while
a rebuild re-assigns and re-writes the whole corpus. This probe builds
a cell-partitioned det-quantizer index over a deterministic synthetic
corpus (dim-64 hash-derived vectors, k=64 pivots → the Arrow
assignment path, the scale path), erases a small fixed set of vectors
(50 — the realistic GDPR geometry), and times:

  - DELETE-IN-PLACE: the registered path (`ivf_delete_in_place`, the
    shared module function — the probe measures the registered shape
    by construction), over a pre-built index staged OUTSIDE timing.
  - REBUILD: assign remaining corpus + full partitioned write (what a
    deployment without in-place deletion runs).

Content equality of the repaired and rebuilt indexes is asserted
(count + order-insensitive crc over (vec_id, cell)) before timings are
reported — the driver-SF oracle proves value-level top-k equivalence
against DuckDB; the probe re-proves index-content equivalence at the
decade geometry.

Usage: python tools/ivf_erasure_probe.py [N_VECTORS ...]
Prints one JSON line per corpus size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from imdb_mapreduce_spark.pipeline.similarity import (  # noqa: E402
    _assigned_cells,
    ivf_delete_in_place,
)
from imdb_mapreduce_spark.session import get_spark  # noqa: E402

DIM = 64
K = 64  # pivot count — above LITERAL_QUANTIZER_MAX_K, so the Arrow path
N_ERASED = 50


def corpus(spark, n: int):
    """n deterministic dim-64 vectors on [0, 1): hash-derived, no RNG."""
    comps = [
        (F.pmod(F.xxhash64("id", F.lit(i)), F.lit(10_000)) / 10_000.0).cast(
            "float"
        )
        for i in range(DIM)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )


def pivots_of(emb):
    """k=K md5-ranked pivots — the det quantizer's pivot rule."""
    rows = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(K)
        .collect()
    )
    return [(i, [float(x) for x in r["embedding"]]) for i, r in enumerate(rows)]


def content_sig(spark, cells_dir: str) -> dict:
    df = spark.read.parquet(cells_dir).select("vec_id", "cell")
    return (
        df.select(
            F.count("*").alias("n"),
            F.sum(
                F.crc32(F.concat_ws(",", "vec_id", "cell"))
            ).alias("sig"),
        )
        .first()
        .asDict()
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000, 4_000_000]
    spark = get_spark()
    for n in sizes:
        tmp = tempfile.mkdtemp()
        try:
            emb = corpus(spark, n)
            pivots = pivots_of(emb)
            # stage the pre-erasure index OUTSIDE timing (it exists
            # already in production)
            cells_dir = os.path.join(tmp, "cells")
            _assigned_cells(emb, pivots).write.partitionBy("cell").parquet(
                cells_dir
            )
            # a small scattered erasure set (every ~n/N_ERASED-th id)
            step = max(1, n // N_ERASED)
            erased = emb.filter(
                (F.col("vec_id") % step == 3) & (F.col("vec_id") < step * N_ERASED)
            ).select("vec_id", "embedding")
            n_erased = erased.count()
            # `vec_id % step == 3` is unsatisfiable when step <= 3 (tiny
            # corpora) — a no-op delete timed against a no-op rebuild
            # would print a misleading row; fail loud instead.
            assert n_erased > 0, (
                f"degenerate probe geometry: n={n} yields an empty erased"
                " set — use a corpus of at least ~200 vectors"
            )

            t0 = time.monotonic()
            touched = ivf_delete_in_place(spark, cells_dir, erased, pivots)
            t_inplace = time.monotonic() - t0

            rebuild_dir = os.path.join(tmp, "rebuild")
            eids = F.broadcast(erased.select("vec_id"))
            t0 = time.monotonic()
            _assigned_cells(
                emb.join(eids, "vec_id", "left_anti"), pivots
            ).write.partitionBy("cell").parquet(rebuild_dir)
            t_rebuild = time.monotonic() - t0

            sig_a = content_sig(spark, cells_dir)
            sig_b = content_sig(spark, rebuild_dir)
            assert sig_a == sig_b, (sig_a, sig_b)
            print(
                json.dumps(
                    {
                        "n_vectors": n,
                        "k_cells": K,
                        "n_erased": n_erased,
                        "touched_cells": len(touched),
                        "delete_in_place_sec": round(t_inplace, 2),
                        "rebuild_sec": round(t_rebuild, 2),
                        "content_sig": sig_a,
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
