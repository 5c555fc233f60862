"""History-purge probe (r15): `erase_versioned_history` vs rebuilding
every version, at the scale10x decades.

The purge claims cost ∝ versions × (erased partials + touched buckets)
— never versions × corpus — because each version is repaired by the
additive inverse of its own erased prefix. The alternative a deployment
without the repair runs is rebuilding EVERY version's snapshot from its
batch prefix (Σ_k |prefix k| ≈ V²/2 corpus scans). This probe stages a
scale10x events corpus as 4 hash-deterministic batches, drains them
into versioned state (coalesced-total convention — the group property
the subtraction needs), erases a small realistic user set
(user_id % 30011 == 3, the erasure_probe geometry), and times:

  - PURGE: `erase_versioned_history` to a fresh root (the registered
    shared function — the probe measures the registered shape by
    construction).
  - REBUILD: per version k, the direct three-tier derivation over the
    REMAINING rows of batches ≤ k, written to a parquet version dir
    (what "no repair machinery" actually costs).

Per-version fingerprints (count + order-insensitive crc over the
minute tier) are asserted equal before timings report.

Usage: python tools/history_purge_probe.py [FACTOR]
Prints one JSON line.
"""

from __future__ import annotations

import functools
import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from pyspark.sql import functions as F  # noqa: E402

import scale10x  # noqa: E402
from imdb_mapreduce_spark.session import get_spark  # noqa: E402
from imdb_mapreduce_spark.sources.star import load_table  # noqa: E402
from imdb_mapreduce_spark.plans.events import (  # noqa: E402
    kmv_k_smallest,
    kmv_minute_pairs,
)
from imdb_mapreduce_spark.streaming.jobs import (  # noqa: E402
    erase_versioned_history,
    erase_versioned_history_sketch,
    incremental_multires_drain,
    multires_kmv_merge_batch,
    multires_merge_batch,
    state_as_of,
)

ERASED = "user_id IS NOT NULL AND user_id % 30011 = 3"


def fingerprint(df):
    return (
        df.select(
            F.count("*").alias("n"),
            F.sum(
                F.crc32(
                    F.concat_ws(
                        ",",
                        F.col("bucket").cast("string"),
                        "event_type",
                        F.col("n_events").cast("string"),
                        F.col("s").cast("string"),
                    )
                )
            ).alias("sig"),
        )
        .first()
        .asDict()
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    corpus = scale10x.build_events(factor)
    spark = get_spark("history-purge-probe")
    events = load_table(spark, "events", corpus).select(
        "ts", "event_type", "value", "user_id"
    )
    out: dict[str, object] = {"factor": factor, "rows": events.count()}
    merge = functools.partial(multires_merge_batch, coalesce_values=True)
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        # 4 hash-deterministic batches (md5 slice of event_id)
        slc = F.pmod(
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("bigint"),
            F.lit(4),
        )
        ev = load_table(spark, "events", corpus).select(
            "ts", "event_type", "value", "user_id", "event_id"
        )
        # ONE file per slice: the file source orders batches by mtime,
        # and ties among same-mtime files are not deterministic — the
        # purge's per-version subtrahend must match the drain's actual
        # batch order exactly (the registered time-travel query stages
        # the same way)
        for i in range(4):
            part = os.path.join(d, f"slice{i}")
            ev.filter(slc == i).drop("event_id").coalesce(1).write.parquet(
                part
            )
            f = sorted(glob.glob(os.path.join(part, "part-*")))[0]
            dst = os.path.join(src, f"b{i}.parquet")
            os.replace(f, dst)
            os.utime(dst, (1_000_000 + i, 1_000_000 + i))
        staged = sorted(
            glob.glob(os.path.join(src, "*.parquet")),
            key=lambda p: (os.stat(p).st_mtime_ns, p),
        )
        batches = [spark.read.parquet(p) for p in staged]
        state_root = os.path.join(d, "state")
        incremental_multires_drain(
            spark, src, batches[0].schema, state_root,
            os.path.join(d, "ckpt"), merge_fn=merge,
        )
        n_versions = len(batches)
        out["versions"] = n_versions

        purged_root = os.path.join(d, "purged")
        t0 = time.monotonic()
        erase_versioned_history(
            spark, state_root, purged_root, batches,
            F.expr(ERASED),
        )
        out["purge_sec"] = round(time.monotonic() - t0, 2)

        rebuild_root = os.path.join(d, "rebuild")
        t0 = time.monotonic()
        for k in range(n_versions):
            prefix = batches[0]
            for b in batches[1:k + 1]:
                prefix = prefix.unionByName(b)
            tiers = multires_merge_batch(
                prefix.filter(f"NOT ({ERASED})"), None, coalesce_values=True
            )
            for tier, df in tiers.items():
                df.write.parquet(
                    os.path.join(rebuild_root, f"v{k}", tier)
                )
        out["rebuild_all_versions_sec"] = round(time.monotonic() - t0, 2)

        for k in range(n_versions):
            a = fingerprint(state_as_of(spark, purged_root, k)["minute"])
            b = fingerprint(
                spark.read.parquet(os.path.join(rebuild_root, f"v{k}", "minute"))
            )
            assert a == b, (k, a, b)
        out["fingerprint_v_last"] = a

        # --- the SKETCH family's history purge: per-version prefix
        # re-derivation (no inverse) — the asymmetry, for history ---
        sk_root = os.path.join(d, "sk_state")
        incremental_multires_drain(
            spark, src, batches[0].schema, sk_root,
            os.path.join(d, "sk_ckpt"), merge_fn=multires_kmv_merge_batch,
        )
        sk_purged = os.path.join(d, "sk_purged")
        t0 = time.monotonic()
        erase_versioned_history_sketch(
            spark, sk_root, sk_purged, batches, F.expr(ERASED)
        )
        out["sketch_purge_sec"] = round(time.monotonic() - t0, 2)
        # last-version check vs the direct remaining-prefix sketch
        prefix = batches[0]
        for b in batches[1:]:
            prefix = prefix.unionByName(b)
        direct_m = kmv_k_smallest(
            kmv_minute_pairs(prefix.filter(f"NOT ({ERASED})"))
        )

        def sk_fp(df):
            return (
                df.select(
                    F.count("*").alias("n"),
                    F.sum(
                        F.crc32(
                            F.concat_ws(
                                ",",
                                F.col("bucket").cast("string"),
                                F.concat_ws("|", "hashes"),
                            )
                        )
                    ).alias("sig"),
                )
                .first()
                .asDict()
            )

        a = sk_fp(
            state_as_of(spark, sk_purged, n_versions - 1)["minute"]
        )
        b = sk_fp(direct_m)
        assert a == b, (a, b)
        out["sketch_fingerprint_v_last"] = a
    print(json.dumps(out))


if __name__ == "__main__":
    main()
