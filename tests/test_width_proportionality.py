"""FIXED-WIDTH-AT-SCALE guards (VERDICT r08 items 3 + 7).

The recurring defect class the r08 scaling decades caught four times:
any per-task structure (shuffled-hash build, aggregation map, parquet
writer, sort buffer) sized by a FIXED partition or bucket count holds
data that grows linearly with the corpus, and OOMs at some decade. The
fixes derive widths from zero-job parquet-footer probes
(``SILVER_BUILD_ROWS_PER_PARTITION``, ``SPAN_DOCS_PER_PARTITION``),
resolving to the session default at driver SFs so measured small-SF
plans and layouts never change.

Those four defects each cost an expensive decade run to find. These
tests make the fifth instance cheap: a deliberate reversion to fixed
width — or a broken restore path — turns them red in seconds.
"""

from __future__ import annotations

import io
import os
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from imdb_mapreduce_spark.sources import silver


def _write_docs(spark, sf_dir: str, n: int) -> None:
    spark.range(n).select(F.col("id").alias("doc_id")).coalesce(1).write.parquet(
        os.path.join(sf_dir, "documents.parquet")
    )


def _width(spark) -> int:
    return int(spark.conf.get("spark.sql.shuffle.partitions"))


def test_build_width_scales_with_footer_rows(spark, tmp_path, monkeypatch):
    """The resolved build width is ceil(footer_rows / divisor) when that
    exceeds the session setting — the data-proportional contract."""
    monkeypatch.setattr(silver, "SILVER_BUILD_ROWS_PER_PARTITION", 10)
    sf_dir = str(tmp_path)
    _write_docs(spark, sf_dir, 100)
    before = _width(spark)
    assert before < 10  # the conftest session is 4-wide; the test needs room
    seen: dict[str, int] = {}

    def build():
        seen["width"] = _width(spark)
        return spark.range(3).select(F.col("id").alias("doc_id"))

    silver.materialized(spark, sf_dir, "w", "documents", {"v": 1}, build)
    assert seen["width"] == 10  # ceil(100 / 10)
    assert _width(spark) == before  # session width restored on success


def test_build_width_restores_on_build_exception(spark, tmp_path, monkeypatch):
    """`with` semantics: a failing build must not leak the widened setting
    into the session (VERDICT r08 item 7)."""
    monkeypatch.setattr(silver, "SILVER_BUILD_ROWS_PER_PARTITION", 10)
    sf_dir = str(tmp_path)
    _write_docs(spark, sf_dir, 100)
    before = _width(spark)

    def build():
        assert _width(spark) == 10  # widened inside the build…
        raise RuntimeError("synthetic build failure")

    with pytest.raises(RuntimeError, match="synthetic build failure"):
        silver.materialized(spark, sf_dir, "wexc", "documents", {"v": 1}, build)
    assert _width(spark) == before  # …and restored despite the exception


def test_build_width_is_noop_at_driver_sf(spark, tmp_path):
    """With the REAL divisor a driver-SF-sized source resolves below the
    session default, so every measured small-SF plan and layout is
    byte-identical to the pre-r08 builds (the no-regression guard that
    lets the widening ship without re-verifying every small-SF number)."""
    assert silver.SILVER_BUILD_ROWS_PER_PARTITION == 1_000_000
    sf_dir = str(tmp_path)
    _write_docs(spark, sf_dir, 1_000)
    before = _width(spark)
    seen: dict[str, int] = {}

    def build():
        seen["width"] = _width(spark)
        return spark.range(3).select(F.col("id").alias("doc_id"))

    silver.materialized(spark, sf_dir, "wsmall", "documents", {"v": 1}, build)
    assert seen["width"] == before


def test_bucket_count_scales_with_footer_rows(spark, tmp_path, monkeypatch):
    """materialized_bucketed's bucket count is a FLOOR that grows with the
    source: fixed buckets = fixed per-bucket volume multiplier = the
    parquet-writer OOM the 1000× decade hit (SCALING.md r08)."""
    monkeypatch.setattr(silver, "SILVER_BUILD_ROWS_PER_PARTITION", 10)
    sf_dir = str(tmp_path)
    _write_docs(spark, sf_dir, 100)
    src = os.path.join(sf_dir, "documents.parquet")

    def build():
        return spark.read.parquet(src)

    silver.materialized_bucketed(
        spark, sf_dir, "bw", "documents", {"v": 1}, build, key="doc_id", buckets=2
    )
    sf_tag = re.sub(r"[^0-9a-zA-Z]", "_", os.path.basename(sf_dir.rstrip("/")))
    table = f"silver_bw_{sf_tag}".lower()
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    }
    assert int(desc["Num Buckets"]) == 10  # max(floor 2, ceil(100 / 10))


def test_bucket_floor_holds_at_driver_sf(spark, tmp_path):
    """With the real divisor a small source keeps the floor bucket count —
    existing driver-SF bucketed layouts are untouched by the r08 change."""
    assert silver.SILVER_BUILD_ROWS_PER_PARTITION == 1_000_000
    sf_dir = str(tmp_path)
    _write_docs(spark, sf_dir, 1_000)
    src = os.path.join(sf_dir, "documents.parquet")

    def build():
        return spark.read.parquet(src)

    silver.materialized_bucketed(
        spark, sf_dir, "bf", "documents", {"v": 1}, build, key="doc_id", buckets=2
    )
    sf_tag = re.sub(r"[^0-9a-zA-Z]", "_", os.path.basename(sf_dir.rstrip("/")))
    table = f"silver_bf_{sf_tag}".lower()
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    }
    assert int(desc["Num Buckets"]) == 2


def _explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_span_gram_width_scales_with_docs(spark, monkeypatch):
    """duplicate_span_pairs sizes its gram shuffle to the corpus: with the
    divisor patched low the plan repartitions the gram relation to
    ceil(n_docs / divisor); with the real divisor, driver SFs stay at the
    session width (no extra exchange — plan unchanged vs pre-r08)."""
    from imdb_mapreduce_spark.pipeline import dedup

    sf = "/root/testdata/sf0.001"  # 500 documents

    plan_default = _explain(dedup.duplicate_span_pairs(spark, sf))
    assert "REPARTITION_BY_NUM" not in plan_default

    monkeypatch.setattr(dedup, "SPAN_DOCS_PER_PARTITION", 10)
    plan_wide = _explain(dedup.duplicate_span_pairs(spark, sf))
    # ceil(500 / 10) = 50 partitions on the gram hash column
    assert "REPARTITION_BY_NUM" in plan_wide
    assert re.search(r"hashpartitioning\(h#\d+L?, 50\)", plan_wide), plan_wide
