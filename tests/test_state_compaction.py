"""`compact_state_version` — the OPTIMIZE verb for the versioned
lineage: content-preserving small-file rewrite under the family's
unservable-never-torn crash discipline, with a journaled self-healing
swap."""

from __future__ import annotations

import os
import shutil

import pytest


def _build_version(spark, state_root, version=0, n_files=6):
    """One committed version whose tiers are deliberately fragmented
    (`n_files` parquet parts each) — the streaming-sink debt the verb
    exists for."""
    import pandas as pd

    vdir = os.path.join(state_root, f"v{version}")
    t0 = pd.Timestamp("2026-04-01 00:00:00")
    rows = [
        (t0 + pd.Timedelta(minutes=i % 90), f"t{i % 3}", 1, float(i))
        for i in range(500)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["bucket", "event_type", "n_events", "s"])
    )
    for tier in ("minute", "hour", "day"):
        df.repartition(n_files).write.parquet(os.path.join(vdir, tier))
    with open(os.path.join(vdir, "_COMMIT"), "w") as f:
        f.write("ok\n")
    return vdir


def _rows(spark, path):
    return sorted(
        map(tuple, spark.read.parquet(path).collect()), key=str
    )


def test_compact_state_version_preserves_content_and_merges_files(
    spark, tmp_path
):
    from imdb_mapreduce_spark.streaming.jobs import compact_state_version

    state_root = str(tmp_path / "state")
    vdir = _build_version(spark, state_root)
    before = {
        t: _rows(spark, os.path.join(vdir, t))
        for t in ("minute", "hour", "day")
    }
    stats = compact_state_version(spark, state_root, 0)
    for t in ("minute", "hour", "day"):
        assert stats[t]["before"] >= 6
        assert stats[t]["after"] == 1  # tiny tier → one target file
        assert _rows(spark, os.path.join(vdir, t)) == before[t]
        assert not os.path.exists(os.path.join(vdir, f"{t}__compact"))
    assert os.path.exists(os.path.join(vdir, "_COMMIT"))
    assert not os.path.exists(os.path.join(vdir, "_COMPACTING"))


def test_compact_state_version_recovers_a_mid_swap_crash(spark, tmp_path):
    """Simulated crash between journal and final commit, at three
    different swap stages at once: minute fully renamed (its __compact
    is gone), hour not yet renamed (both dirs present), day half-swapped
    (old dir removed, __compact present). One call must converge to the
    committed compacted state."""
    from imdb_mapreduce_spark.streaming.jobs import compact_state_version

    state_root = str(tmp_path / "state")
    vdir = _build_version(spark, state_root)
    before = {
        t: _rows(spark, os.path.join(vdir, t))
        for t in ("minute", "hour", "day")
    }
    # stage the compacted copies the way step 1 would
    for t in ("hour", "day"):
        spark.read.parquet(os.path.join(vdir, t)).repartition(1).write.parquet(
            os.path.join(vdir, f"{t}__compact")
        )
    with open(os.path.join(vdir, "_COMPACTING"), "w") as f:
        f.write("ok\n")
    os.remove(os.path.join(vdir, "_COMMIT"))
    shutil.rmtree(os.path.join(vdir, "day"))  # day: old dir already gone
    # minute: fully swapped already (no __compact, tier dir present)

    out = compact_state_version(spark, state_root, 0)
    assert sorted(out["recovered"]) == ["day", "hour"]
    for t in ("minute", "hour", "day"):
        assert _rows(spark, os.path.join(vdir, t)) == before[t]
        assert not os.path.exists(os.path.join(vdir, f"{t}__compact"))
    assert os.path.exists(os.path.join(vdir, "_COMMIT"))
    assert not os.path.exists(os.path.join(vdir, "_COMPACTING"))
    # and the recovered version is servable + compactable again
    stats = compact_state_version(spark, state_root, 0)
    assert stats["hour"]["after"] == 1


def test_compact_state_version_refuses_uncommitted(spark, tmp_path):
    """No marker and no journal = never committed: refuse loudly (the
    same contract as `state_as_of`), don't 'repair' a torn fold."""
    from imdb_mapreduce_spark.streaming.jobs import compact_state_version

    state_root = str(tmp_path / "state")
    vdir = _build_version(spark, state_root)
    os.remove(os.path.join(vdir, "_COMMIT"))
    with pytest.raises(ValueError, match="never"):
        compact_state_version(spark, state_root, 0)
