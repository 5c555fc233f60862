"""Guards for the driver's 50-row correctness window rotation.

The external driver records at most ~50 correctness rows per round, in
`all_queries()` iteration order. These tests make an unrotated round a test
failure instead of a silent coverage gap (VERDICT r02 items 1 and 7):

- `_HEAD`/`_TAIL` must reference real registry entries (stale names raise);
- every query whose latest `CORRECTNESS_r*.json` row is missing or
  non-green must sit in `_HEAD` (so the next sweep reaches it first);
- everything pushed outside the 50-row window must already hold a green
  hash-matched row in the latest correctness file.
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


def _latest_correctness() -> dict:
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not paths:
        pytest.skip("no CORRECTNESS_r*.json yet (round 1)")
    latest = max(paths, key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    with open(latest) as f:
        return json.load(f)


def test_head_tail_reference_real_queries():
    names = set(all_queries())  # raises KeyError on stale rotation entries
    assert set(registry._HEAD) <= names
    assert set(registry._TAIL) <= names
    assert not set(registry._HEAD) & set(registry._TAIL)


def test_head_and_tail_order_is_respected():
    ordered = list(all_queries())
    assert tuple(ordered[: len(registry._HEAD)]) == registry._HEAD
    assert tuple(ordered[-len(registry._TAIL) :]) == registry._TAIL


def test_unverified_queries_rotated_to_head():
    """A query with no green hash row in the latest round must be in _HEAD."""
    rows = _latest_correctness()
    missing = [
        name
        for name in all_queries()
        if not rows.get(name, {}).get("hash_match")
    ]
    not_rotated = [n for n in missing if n not in registry._HEAD]
    assert not not_rotated, (
        f"queries lacking a green row in the latest CORRECTNESS file are not "
        f"in _HEAD — they will miss the driver's {WINDOW}-row window again: "
        f"{not_rotated}"
    )


def test_out_of_window_queries_already_green():
    """Nothing beyond position 50 may still need a driver row."""
    rows = _latest_correctness()
    ordered = list(all_queries())
    out_of_window = ordered[WINDOW:]
    ungreen = [
        n for n in out_of_window if not rows.get(n, {}).get("hash_match")
    ]
    assert not ungreen, (
        f"out-of-window queries without a green row in the latest "
        f"CORRECTNESS file (grow _TAIL only with already-green entries): "
        f"{ungreen}"
    )
