"""Print the registered query inventory: name, oracle-backed?, tags, doc.

Usage: python tools/list_queries.py [--md]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imdb_mapreduce_spark.plans.registry import all_queries  # noqa: E402


def main() -> None:
    md = "--md" in sys.argv
    qs = all_queries()
    n_oracle = sum(1 for q in qs.values() if q.oracle)
    if md:
        print(f"# Query inventory — {len(qs)} queries ({n_oracle} oracle-backed)\n")
        print("| query | oracle | tags | what |")
        print("|---|---|---|---|")
    else:
        print(f"{len(qs)} queries ({n_oracle} oracle-backed, "
              f"{len(qs) - n_oracle} rows-only)\n")
    for name in sorted(qs):
        q = qs[name]
        first_line = (q.doc or "").strip().splitlines()[0] if q.doc else ""
        mark = "✓" if q.oracle else "rows-only"
        if md:
            print(f"| `{name}` | {mark} | {', '.join(q.tags)} | {first_line} |")
        else:
            print(f"  {name:28s} [{mark:9s}] {', '.join(q.tags)}")
            if first_line:
                print(f"      {first_line}")


if __name__ == "__main__":
    main()
