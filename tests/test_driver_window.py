"""The external driver checks only the first 50 queries() entries, in
registration order. REGISTRY is therefore rotated least-recently-verified
first (plans/__init__._reorder_for_driver_window). These tests pin the
rotation's contract so a future registration change can't silently push a
never-checked query outside the driver's window again (r2's failure mode).
"""

from __future__ import annotations

import json
import pathlib
import re

from real_time_flight_data_pipeline_spark.plans import (
    DRIVER_QUERY_CAP,
    DRIVER_WINDOW_TAIL,
    REGISTRY,
)

_ROOT = pathlib.Path(__file__).resolve().parents[1]


def _green_by_round() -> dict[str, int]:
    last = {}
    for p in sorted(_ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.stem).group(1))
        for name, row in json.loads(p.read_text()).items():
            if row.get("err") is not None:
                continue
            if row.get("rows_match") is False or row.get("hash_match") is False:
                continue
            last[name] = max(last.get(name, 0), rnd)
    return last


def test_tail_matches_registry_order():
    assert list(REGISTRY)[DRIVER_QUERY_CAP:] == DRIVER_WINDOW_TAIL


def test_never_verified_queries_inside_driver_window():
    """Every query without a green CORRECTNESS row in ANY past round must sit
    inside the first 50 registrations, where the driver will check it."""
    last_green = _green_by_round()
    window = set(list(REGISTRY)[:DRIVER_QUERY_CAP])
    missing = [n for n in REGISTRY if n not in last_green and n not in window]
    assert not missing, f"never-driver-verified queries outside window: {missing}"


def test_tail_only_contains_recently_green_queries():
    """Only queries green in the most recent round may be parked outside the
    window — and the rotation will cycle them back in as others go green."""
    last_green = _green_by_round()
    latest = max(last_green.values(), default=0)
    stale = [n for n in DRIVER_WINDOW_TAIL if last_green.get(n, -1) != latest]
    assert not stale, f"stale/never-green queries parked outside window: {stale}"
