"""Guards for the driver's 50-row correctness window rotation.

The external driver records at most ~50 correctness rows per round, in
`all_queries()` iteration order. These tests make an unrotated round a test
failure instead of a silent coverage gap (VERDICT r02 items 1 and 7).

VERDICT r04 item 1: greenness is computed over the UNION of all
`CORRECTNESS_r*.json` files, not just the latest. The driver drops a new
correctness file into the repo *after* the builder's closing commit, so a
latest-file-only invariant turned the suite red at every judge checkpoint
even though every out-of-window query held a green row from an earlier
round. Union-greenness is the invariant that actually matters (the judge
grades union coverage), and it is stable under a freshly-landed driver file.

Invariants enforced:
- `_HEAD`/`_TAIL` must reference real registry entries (stale names raise);
- every oracle-backed query with NO green hash row in ANY round must sit in
  `_HEAD` (so the next sweep reaches it first);
- everything pushed outside the 50-row window must already hold a green
  hash-matched row in SOME round (union greenness).
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

from imdb_mapreduce_spark.plans import registry
from imdb_mapreduce_spark.plans.registry import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _union_green() -> set[str]:
    """Names with a hash-matched green row in ANY CORRECTNESS_r*.json."""
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not paths:
        pytest.skip("no CORRECTNESS_r*.json yet (round 1)")
    green: set[str] = set()
    for p in paths:
        with open(p) as f:
            rows = json.load(f)
        green |= {name for name, row in rows.items() if row.get("hash_match")}
    return green


def _latest_round() -> int:
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not paths:
        return 0
    return max(int(re.search(r"r(\d+)", p).group(1)) for p in paths)


def test_head_tail_reference_real_queries():
    names = set(all_queries())  # raises KeyError on stale rotation entries
    assert set(registry._HEAD) <= names
    assert set(registry._TAIL) <= names
    assert not set(registry._HEAD) & set(registry._TAIL)


def test_head_fits_driver_window():
    """_HEAD must not overflow the driver's 50-row window (ADVICE r08).

    The driver records exactly the first WINDOW rows of all_queries()
    order; a 51st _HEAD entry silently misses its re-verification while
    the rotation record claims it is in-window. Exact equality is
    enforced (not ≤): with a 139-query registry, an under-full window
    wastes sweep slots the stalest _TAIL entries should be using.
    """
    assert len(registry._HEAD) == WINDOW, (
        f"_HEAD has {len(registry._HEAD)} entries; the driver window is "
        f"{WINDOW} — entries past position {WINDOW} silently miss this "
        f"round's re-verification"
    )


def test_head_and_tail_order_is_respected():
    ordered = list(all_queries())
    assert tuple(ordered[: len(registry._HEAD)]) == registry._HEAD
    assert tuple(ordered[-len(registry._TAIL) :]) == registry._TAIL


def test_never_green_queries_rotated_to_head():
    """An oracle-backed query with no green hash row in ANY round → _HEAD.

    Rows-only queries (oracle=None) can never earn hash green; they are
    exempt here (a separate policy choice keeps them near the front so each
    round refreshes their rows-only record, but that is not load-bearing).
    """
    green = _union_green()
    qs = all_queries()
    missing = [
        name for name, q in qs.items() if q.oracle is not None and name not in green
    ]
    not_rotated = [n for n in missing if n not in registry._HEAD]
    assert not not_rotated, (
        f"oracle-backed queries with no green row in any CORRECTNESS round "
        f"are not in _HEAD — they may miss the driver's {WINDOW}-row window "
        f"again: {not_rotated}"
    )


def test_out_of_window_queries_union_green():
    """Nothing beyond position 50 may still lack a green row in every round."""
    green = _union_green()
    qs = all_queries()
    ordered = list(qs)
    out_of_window = ordered[WINDOW:]
    ungreen = [
        n for n in out_of_window if qs[n].oracle is not None and n not in green
    ]
    assert not ungreen, (
        f"out-of-window queries without a green row in ANY CORRECTNESS file "
        f"(grow _TAIL only with already-green entries): {ungreen}"
    )


def test_window_front_is_staler_than_tail():
    """The in-window queries must not be fresher than what was pushed out.

    Concretely: every _TAIL entry beyond the window must have a green row at
    least as recent as the OLDEST green round among in-window oracle-backed
    queries would require — i.e. no query inside the window may hold a green
    row from the CURRENT latest round while a _TAIL query's newest green row
    is ≥2 rounds stale. This is a soft staleness bound that catches a
    forgotten rotation (everything fresh crowded into the window) without
    being brittle to the driver landing a new file mid-round.
    """
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not paths:
        pytest.skip("no CORRECTNESS_r*.json yet (round 1)")
    newest_green: dict[str, int] = {}
    oldest_green: dict[str, int] = {}
    for p in paths:
        rnd = int(re.search(r"r(\d+)", p).group(1))
        with open(p) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("hash_match"):
                newest_green[name] = max(newest_green.get(name, 0), rnd)
                oldest_green[name] = min(oldest_green.get(name, rnd), rnd)
    latest = _latest_round()
    qs = all_queries()
    ordered = list(qs)
    in_window = [n for n in ordered[:WINDOW] if qs[n].oracle is not None]
    # If the window is entirely made of queries already green in the latest
    # round, the rotation was forgotten: stale queries exist (outside) but
    # fresh ones hog the sweep.
    stale_outside = [
        n
        for n in ordered[WINDOW:]
        if qs[n].oracle is not None and newest_green.get(n, 0) <= latest - 2
    ]
    window_all_fresh = all(newest_green.get(n, 0) == latest for n in in_window)
    # ADVICE r05 item 1: the old any-first-green escape suppressed the
    # alarm every round (every round registers new queries). The scoped
    # rule counts WASTED slots instead: a window slot is wasted when it
    # re-verifies a query that was already green in the immediately
    # preceding round (pre-round staleness ≤ 1) — with a registry ~2.6×
    # the window, stalest-first rotation never needs to do that beyond a
    # bounded allowance of code-changed-this-round re-verifies (~10,
    # documented per round in COVERAGE.md). First-green entries and
    # promoted ≥2-round-stale entries are never wasted, so a properly
    # rotated consolidation round stays silent, while a forgotten
    # rotation (the window still holding last round's freshly-green head)
    # trips the allowance immediately.
    ALLOWED_REVERIFY = 12
    pre_newest: dict[str, int] = {}
    for p in paths:
        rnd = int(re.search(r"r(\d+)", p).group(1))
        if rnd >= latest:
            continue
        with open(p) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("hash_match"):
                pre_newest[name] = max(pre_newest.get(name, 0), rnd)
    wasted_slots = sum(
        1 for n in in_window if pre_newest.get(n, 0) >= latest - 1
    )
    assert not (
        stale_outside and window_all_fresh and wasted_slots > ALLOWED_REVERIFY
    ), (
        f"rotation forgotten: {wasted_slots} driver-window slots went to "
        f"re-verifying queries already green in round {latest - 1} "
        f"(allowance {ALLOWED_REVERIFY} for code-changed re-verifies), while "
        f"{len(stale_outside)} out-of-window queries are ≥2 rounds stale: "
        f"{stale_outside[:10]}"
    )
