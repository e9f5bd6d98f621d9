"""The external driver checks only the first 50 queries() entries, in
registration order. REGISTRY is therefore rotated least-recently-verified
first (plans/__init__._reorder_for_driver_window). These tests pin the
rotation's contract so a future registration change can't silently push a
never-checked query outside the driver's window again (r2's failure mode),
and pin the coverage invariant that everything parked outside one round's
window is checked the next round.
"""

from __future__ import annotations

import json
import pathlib
import re

from real_time_flight_data_pipeline_spark.plans import (
    DRIVER_QUERY_CAP,
    DRIVER_WINDOW_TAIL,
    ORIGINAL_ORDER,
    REGISTRY,
    _row_is_green,
)

_ROOT = pathlib.Path(__file__).resolve().parents[1]

# First round whose CORRECTNESS keys reflect the rotated ordering (the
# rotation landed during round 3).
_FIRST_ROTATED_ROUND = 3


def _rounds() -> dict[int, dict]:
    out = {}
    for p in sorted(_ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.stem).group(1))
        out[rnd] = json.loads(p.read_text())
    return out


def _green_by_round(upto: int | None = None) -> dict[str, int]:
    last = {}
    for rnd, data in _rounds().items():
        if upto is not None and rnd > upto:
            continue
        for name, row in data.items():
            if _row_is_green(row):
                last[name] = max(last.get(name, 0), rnd)
    return last


def test_row_is_green_requires_positive_full_match():
    """A null-match err-free row (rows-only check, driver hiccup) must NOT
    count green — 'not False' logic let unverified queries rotate out."""
    assert _row_is_green({"rows_match": True, "hash_match": True, "err": None})
    # the exact shape the driver emits for rows-only / errored checks:
    assert not _row_is_green(
        {"rows_match": None, "hash_match": None, "err": "no_oracle"}
    )
    assert not _row_is_green({"rows_match": None, "hash_match": None, "err": None})
    assert not _row_is_green({"rows_match": True, "hash_match": None, "err": None})
    assert not _row_is_green({"rows_match": True, "hash_match": False, "err": None})
    assert not _row_is_green({"rows_match": True, "hash_match": True, "err": "x"})
    assert not _row_is_green(None)


def test_tail_matches_registry_order():
    assert list(REGISTRY)[DRIVER_QUERY_CAP:] == DRIVER_WINDOW_TAIL


def test_catalog_size_keeps_driver_staleness_within_three_rounds():
    """The rotation budget (r6 verdict #4): with N registered queries and
    a 50-slot driver window, a full driver-verification cycle takes
    ceil(N/50) rounds — that IS the max achievable driver-green staleness.
    r6 ended at 145/50 = 3 rounds, exactly at the contract's ceiling;
    any round that pushes N past 3*50 silently degrades 'every query
    freshly driver-verified within 3 rounds' to 4. This pins the budget:
    new catalog entries beyond 150 require RETIRING or MERGING existing
    entries first (fold instrumentation twins into their production
    queries), not a looser gate."""
    max_staleness_rounds = -(-len(REGISTRY) // DRIVER_QUERY_CAP)
    assert max_staleness_rounds <= 3, (
        f"catalog has {len(REGISTRY)} queries; a {DRIVER_QUERY_CAP}-slot "
        f"driver window now needs {max_staleness_rounds} rounds per full "
        "verification cycle — retire/merge entries before adding more "
        f"(budget: {3 * DRIVER_QUERY_CAP})"
    )


def test_never_verified_queries_inside_driver_window():
    """Every query without a green CORRECTNESS row in ANY past round must sit
    inside the first 50 registrations, where the driver will check it."""
    last_green = _green_by_round()
    window = set(list(REGISTRY)[:DRIVER_QUERY_CAP])
    missing = [n for n in REGISTRY if n not in last_green and n not in window]
    assert not missing, f"never-driver-verified queries outside window: {missing}"


def test_tail_only_contains_recently_green_queries():
    """Only recently-green queries may be parked outside the window — and
    the rotation will cycle them back in as others go green. With N
    registered queries and a 50-query window, a full verification cycle
    takes ceil(N/50) rounds, so the achievable freshness bound for parked
    queries is ceil((N-50)/50) rounds of staleness (exactly 1 while the
    catalog fit in 100; 2 from the r6 catalog of 106)."""
    last_green = _green_by_round()
    latest = max(last_green.values(), default=0)
    max_lag = -(-(len(REGISTRY) - DRIVER_QUERY_CAP) // DRIVER_QUERY_CAP)
    floor = latest - (max_lag - 1)
    stale = [n for n in DRIVER_WINDOW_TAIL if last_green.get(n, -1) < floor]
    assert not stale, (
        f"queries parked outside window with last green row < r{floor}: {stale}"
    )


def _reconstruct_tail(round_n: int) -> list[str]:
    """The tail (unchecked queries) as the rotation computed it when round
    ``round_n`` ran: universe = queries that existed then (appeared in any
    CORRECTNESS file <= round_n; registration is append-only so today's
    ORIGINAL_ORDER restricted to them preserves their relative order),
    staleness from rounds < round_n."""
    rounds = _rounds()
    universe = set()
    for rnd, data in rounds.items():
        if rnd <= round_n:
            universe.update(data.keys())
    last_green = _green_by_round(upto=round_n - 1)
    order = sorted(
        (n for n in ORIGINAL_ORDER if n in universe),
        key=lambda n: last_green.get(n, -1),
    )
    return order[DRIVER_QUERY_CAP:]


def test_window_rotation_coverage():
    """Rotation keeps every query's staleness at the achievable minimum.
    While the universe fit in 2x the window (<=100 queries), nothing may go
    unchecked two rounds in a row. Beyond that, up to (N - 100) queries
    MUST be double-parked each round — but only the freshest may be (green
    exactly two rounds back, i.e. as fresh as a double-parked query can
    possibly be). Runs against the committed driver artifacts, so the
    invariant is re-proven every round."""
    rounds = _rounds()
    for rnd in sorted(rounds):
        if rnd <= _FIRST_ROTATED_ROUND:
            continue
        universe = set()
        for r2, data in rounds.items():
            if r2 <= rnd:
                universe.update(data.keys())
        prev_tail = set(_reconstruct_tail(rnd - 1))
        checked = set(rounds[rnd].keys())
        unchecked_twice = prev_tail - checked
        max_leftover = max(0, len(universe) - 2 * DRIVER_QUERY_CAP)
        assert len(unchecked_twice) <= max_leftover, (
            f"round {rnd} left round {rnd - 1}'s parked queries unchecked "
            f"beyond the {max_leftover} the window size forces: "
            f"{sorted(unchecked_twice)}"
        )
        if unchecked_twice:
            last_green = _green_by_round(upto=rnd - 1)
            not_freshest = [
                n for n in unchecked_twice if last_green.get(n, -1) < rnd - 2
            ]
            assert not not_freshest, (
                f"round {rnd} double-parked queries that were already stale: "
                f"{sorted(not_freshest)}"
            )
