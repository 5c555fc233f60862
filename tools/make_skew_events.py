"""Build the SKEWED 100M-event stream used by SCALING.md r10's hot-key
A/B: the 1000x events corpus with ``user_id % 5 < 3`` remapped to one
``hot`` event type (59.8% of rows on a single key).

Usage: python tools/make_skew_events.py
Reads  spark-warehouse/scale1000x/events.parquet (tools/scale10x.py
build_events(1000) builds it), writes
spark-warehouse/skew1000x/events.parquet, streamed row-group-by-row-group
so the writer is fixed-width at any factor (the same rule as the engine
it feeds).
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "spark-warehouse", "scale1000x", "events.parquet")
OUT_DIR = os.path.join(REPO, "spark-warehouse", "skew1000x")


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, "events.parquet")
    pf = pq.ParquetFile(SRC)
    writer = pq.ParquetWriter(out, pf.schema_arrow)
    hot_total = total = 0
    try:
        for i in range(pf.num_row_groups):
            t = pf.read_row_group(i)
            uid = t.column("user_id")
            # pyarrow.compute has no mod(): uid - (uid // 5) * 5
            mask = pc.less(
                pc.subtract(uid, pc.multiply(pc.divide(uid, 5), 5)), 3
            )
            new_type = pc.if_else(mask, pa.scalar("hot"), t.column("event_type"))
            t = t.set_column(
                t.schema.get_field_index("event_type"), "event_type", new_type
            )
            hot_total += pc.sum(pc.cast(mask, pa.int64())).as_py()
            total += len(t)
            writer.write_table(t)
    finally:
        writer.close()
    print(
        {"rows": total, "hot_rows": hot_total,
         "hot_frac": round(hot_total / total, 3), "out": out}
    )


if __name__ == "__main__":
    main()
