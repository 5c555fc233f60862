"""VARIANT shredded-read probe (VERDICT r11 item 4 — completes the
JSON-decode tier guidance of SCALING.md r11).

The r11 trilogy measured DECODE-AT-READ from string-at-rest parquet:
string re-parse 8.57 s > variant 4.84 s > struct 3.67 s on 3-distinct-
path reads at 10M rows. The open question for 100 TB silver-layer
design: if the VARIANT is decoded ONCE AT WRITE and persisted — 4.1.2
reads shredded variant by default (`allowReadingShredded=true`) but
only exposes the WRITER through the test-gated
`spark.sql.variant.forceShreddingSchemaForTest` — does a shredded
variant column close the gap to typed struct columns ("variant now,
struct-speed later")?

Arms (identical 10M-row corpus synthesized from scale100x events as
``{"k": <user_id>, "v": <value>, "e": "<type>"}``; identical
3-distinct-path extraction -> groupBy-sum; min-of-3 per arm):

  at-rest STRING  : get_json_object x3          (r11: 8.57 s)
  at-rest STRING  : parse_json + try_variant_get x3   (r11: 4.84 s)
  at-rest STRING  : from_json struct + 3 reads  (r11: 3.67 s)
  at-rest VARIANT (unshredded) : try_variant_get x3
  at-rest VARIANT (SHREDDED)   : try_variant_get x3   <- the probe
  at-rest STRUCT  (typed cols) : 3 direct reads        <- the floor

Also prints the parquet footer schema of the shredded vs unshredded
variant files (via the JVM ParquetFileReader — pyarrow cannot parse the
new variant logical type) so "shredding actually happened" is shown,
not assumed.

Usage: python tools/variant_shred_probe.py [rows]  (default 10_000_000)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = os.path.join(REPO, "spark-warehouse", "shred_probe")
SHRED_SCHEMA = "k bigint, v double, e string"


def footer_schema(spark, path: str) -> str:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = fs_path.getFileSystem(conf)
    part = None
    for st in fs.listStatus(fs_path):
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            part = st.getPath()
            break
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(
        jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(part, conf)
    )
    try:
        return reader.getFileMetaData().getSchema().toString()
    finally:
        reader.close()


def timed(df_builder, n_passes: int = 3) -> float:
    best = None
    for _ in range(n_passes):
        t = time.time()
        df_builder().collect()
        el = time.time() - t
        best = el if best is None else min(best, el)
    return round(best, 2)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from pyspark.sql import functions as F

    from imdb_mapreduce_spark.session import get_spark
    from imdb_mapreduce_spark.sources.star import load_table

    spark = get_spark("variant_shred_probe", master="local[32]")
    spark.range(1).count()

    src_dir = os.path.join(REPO, "spark-warehouse", "scale100x")
    ev = load_table(spark, "events", src_dir).limit(rows)
    doc = F.concat(
        F.lit('{"k": '),
        F.col("user_id").cast("string"),
        F.lit(', "v": '),
        F.col("value").cast("string"),
        F.lit(', "e": "'),
        F.col("event_type"),
        F.lit('"}'),
    ).alias("doc")

    p_str = os.path.join(WORK, "docs_string.parquet")
    p_var = os.path.join(WORK, "docs_variant.parquet")
    p_shred = os.path.join(WORK, "docs_variant_shredded.parquet")
    p_struct = os.path.join(WORK, "docs_struct.parquet")

    ev.select(doc).write.mode("overwrite").parquet(p_str)
    strings = spark.read.parquet(p_str)
    strings.select(F.parse_json("doc").alias("var")).write.mode(
        "overwrite"
    ).parquet(p_var)
    spark.conf.set("spark.sql.variant.forceShreddingSchemaForTest", SHRED_SCHEMA)
    try:
        strings.select(F.parse_json("doc").alias("var")).write.mode(
            "overwrite"
        ).parquet(p_shred)
    finally:
        spark.conf.unset("spark.sql.variant.forceShreddingSchemaForTest")
    strings.select(
        F.from_json("doc", SHRED_SCHEMA).alias("s")
    ).select("s.k", "s.v", "s.e").write.mode("overwrite").parquet(p_struct)

    print("=== shredded footer ===")
    print(footer_schema(spark, p_shred))
    print("=== unshredded footer ===")
    print(footer_schema(spark, p_var))

    def run_string_reparse():
        d = spark.read.parquet(p_str)
        return (
            d.select(
                F.get_json_object("doc", "$.k").cast("bigint").alias("k"),
                F.get_json_object("doc", "$.v").cast("double").alias("v"),
                F.get_json_object("doc", "$.e").alias("e"),
            )
            .groupBy("e")
            .agg(F.sum("k").alias("sk"), F.sum("v").alias("sv"))
        )

    def run_string_variant():
        d = spark.read.parquet(p_str).select(F.parse_json("doc").alias("var"))
        return (
            d.select(
                F.try_variant_get("var", "$.k", "bigint").alias("k"),
                F.try_variant_get("var", "$.v", "double").alias("v"),
                F.try_variant_get("var", "$.e", "string").alias("e"),
            )
            .groupBy("e")
            .agg(F.sum("k").alias("sk"), F.sum("v").alias("sv"))
        )

    def run_string_struct():
        d = spark.read.parquet(p_str).select(
            F.from_json("doc", SHRED_SCHEMA).alias("s")
        )
        return (
            d.select("s.k", "s.v", "s.e")
            .groupBy("e")
            .agg(F.sum("k").alias("sk"), F.sum("v").alias("sv"))
        )

    def run_variant_at_rest(path):
        def go():
            d = spark.read.parquet(path)
            return (
                d.select(
                    F.try_variant_get("var", "$.k", "bigint").alias("k"),
                    F.try_variant_get("var", "$.v", "double").alias("v"),
                    F.try_variant_get("var", "$.e", "string").alias("e"),
                )
                .groupBy("e")
                .agg(F.sum("k").alias("sk"), F.sum("v").alias("sv"))
            )

        return go

    def run_struct_at_rest():
        d = spark.read.parquet(p_struct)
        return d.groupBy("e").agg(F.sum("k").alias("sk"), F.sum("v").alias("sv"))

    results = {
        "rows": rows,
        "string_reparse_x3": timed(run_string_reparse),
        "string_parse_variant": timed(run_string_variant),
        "string_from_json_struct": timed(run_string_struct),
        "variant_at_rest": timed(run_variant_at_rest(p_var)),
        "variant_at_rest_shredded": timed(run_variant_at_rest(p_shred)),
        "struct_at_rest": timed(run_struct_at_rest),
    }
    print(json.dumps(results, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
