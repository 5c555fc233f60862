"""Plan the next driver-correctness-window rotation (COVERAGE.md policy,
executable).

The external driver records ~50 correctness rows per round in
``all_queries()`` order; plans/registry.py's ``_HEAD``/``_TAIL`` encode
the rotation. The policy (enforced after the fact by
tests/test_registry_rotation.py) is:

1. queries whose CODE changed this round re-verify in-window (≤ the
   12-slot allowance), listed first;
2. every oracle-backed query with NO green row in ANY round must be
   in-window (new registrations);
3. the rest of the window promotes the STALEST union-green queries
   first (newest green round ascending, registry order as tiebreak);
4. ``_TAIL`` is the next round's promotion queue: everything else,
   stalest first; displaced fills lead it.

This tool computes that plan from the landed CORRECTNESS_r*.json files
and prints paste-ready ``_HEAD``/``_TAIL`` tuples plus the per-name
staleness evidence. It CHANGES nothing — the human (or next-round
builder) pastes and the rotation tests verify.

Usage:
  python tools/plan_rotation.py [--code-changed name1,name2,...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def newest_green_rounds(paths: list[str]) -> dict[str, int]:
    """Query name → newest round with a hash-green driver row."""
    newest: dict[str, int] = {}
    for p in paths:
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        with open(p) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("hash_match"):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def plan(
    registry_order: list[str],
    oracle_backed: set[str],
    newest: dict[str, int],
    code_changed: list[str],
    window: int = WINDOW,
) -> tuple[list[str], list[str], list[str]]:
    """Return (head, tail, notes). Pure — unit-tested on synthetic data."""
    notes: list[str] = []
    unknown = [n for n in code_changed if n not in registry_order]
    if unknown:
        raise SystemExit(f"--code-changed names not in registry: {unknown}")

    never_green = [
        n
        for n in registry_order
        if n in oracle_backed and n not in newest and n not in code_changed
    ]
    if never_green:
        notes.append(
            f"never-green (MUST be in-window): {never_green}"
        )

    # stalest-first promotion of union-green queries, stable on current
    # registry order within a staleness class
    remaining = [
        n
        for n in registry_order
        if n not in code_changed and n not in never_green
    ]
    promotion = sorted(remaining, key=lambda n: (newest.get(n, 0),))

    head = list(code_changed) + never_green
    head += promotion[: window - len(head)]
    if len(head) > window:
        raise SystemExit(
            f"code-changed + never-green ({len(code_changed)} + "
            f"{len(never_green)}) overflow the {window}-slot window"
        )
    head_set = set(head)
    # tail = next round's promotion queue, stalest first
    tail = [n for n in promotion if n not in head_set]
    if len(code_changed) > 12:
        notes.append(
            f"{len(code_changed)} code-changed re-verifies exceeds the "
            "12-slot allowance test_window_front_is_staler_than_tail grants"
        )
    return head, tail, notes


def main() -> None:
    code_changed: list[str] = []
    for i, a in enumerate(sys.argv):
        if a == "--code-changed" and i + 1 < len(sys.argv):
            code_changed = [s for s in sys.argv[i + 1].split(",") if s]

    from imdb_mapreduce_spark.plans.registry import all_queries

    qs = all_queries()
    registry_order = list(qs)
    oracle_backed = {n for n, q in qs.items() if q.oracle is not None}
    paths = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    newest = newest_green_rounds(paths)

    head, tail, notes = plan(
        registry_order, oracle_backed, newest, code_changed
    )
    for n in notes:
        print(f"# NOTE: {n}")
    latest = max(
        (int(re.search(r"r(\d+)", p).group(1)) for p in paths), default=0
    )
    print(f"# planned from CORRECTNESS_r01..r{latest:02d}; window={WINDOW}")
    print("# staleness of promoted window entries (newest green round):")
    for n in head:
        tag = (
            "code-changed"
            if n in code_changed
            else f"green r{newest[n]:02d}"
            if n in newest
            else "NEVER GREEN"
        )
        print(f"#   {n}: {tag}")
    print("_HEAD: tuple[str, ...] = (")
    for n in head:
        print(f'    "{n}",')
    print(")")
    print("_TAIL: tuple[str, ...] = (")
    for n in tail:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
