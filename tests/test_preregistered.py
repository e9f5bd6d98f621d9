"""Catalog queries banked ahead of their registration window (COVERAGE.md
"Next catalog addition") and the semantics pinned at banking time.

`docs_near_dup_ingest` was banked in r13 and registered in r14 when its
reserved slot opened; its oracle match is covered by the registry-wide
gate (tests/test_oracle.py) and what stays here is its planted-status
contract. `docs_tombstone_ingest` is r14's bank for r15: the
oracle-paired spec twin of ingest classification against a store with
live tombstones (r14's delete support) — implemented and oracle-verified
every session here, registered in r15 together with the pre-planned
retirement of `rfm_purchase_segments_approx` (the rotation's r12-cohort
slot — COVERAGE.md cohort math).
"""

from __future__ import annotations

from real_time_flight_data_pipeline_spark.plans.catalog import (
    REGISTRY,
    RETIRED_REGISTRY,
)
from real_time_flight_data_pipeline_spark.plans.llm_ext import (
    _docs_tombstone_ingest_oracle,
    q_docs_near_dup_ingest,
    q_docs_tombstone_ingest,
)

from .conftest import SF_CORRECT, SF_SMOKE
from .oracle_harness import compare


def test_near_dup_ingest_registered():
    """r14 flipped @_register on (VERDICT r13 item 1): the query is in the
    active registry with its DuckDB oracle attached."""
    assert "docs_near_dup_ingest" in REGISTRY
    assert REGISTRY["docs_near_dup_ingest"].oracle is not None
    assert len(REGISTRY) == 150  # rotation ceiling fully used again


def test_near_dup_ingest_planted_statuses(spark):
    """Every status of the NearDupCorpusStore accept contract is exercised
    by the planted batch and classified as designed (verified identical at
    sf0.001 and sf0.01 against the oracle)."""
    rows = {
        r.doc_id: r.status
        for r in q_docs_near_dup_ingest(spark, SF_SMOKE).collect()
    }
    assert rows[0] == "replayed"
    assert rows[9_000_001] == "dup_hist"
    assert rows[9_000_002] == "dup_batch"   # loses the min-id race to doc 9
    assert rows[9_000_004] == "near_dup"    # appended-token twin of history
    assert rows[9_000_005] == "near_dup"    # in-batch appended-token twin
    assert "accepted" in rows.values()


def test_tombstone_ingest_oracle_match(spark):
    ok, msg = compare(
        spark,
        SF_CORRECT,
        q_docs_tombstone_ingest,
        _docs_tombstone_ingest_oracle(),
    )
    assert ok, msg


def test_tombstone_ingest_planted_statuses(spark):
    """The delete-specific classification deltas, pinned per planted row:
    a tombstoned id re-sent is ACCEPTED (the store resurrects by
    cancelling the tombstone), and dead content under a new id is
    ACCEPTED (a dead fingerprint no longer blocks) — where a live history
    would have said replayed / dup_hist respectively."""
    rows = {
        r.doc_id: r.status
        for r in q_docs_tombstone_ingest(spark, SF_SMOKE).collect()
    }
    assert rows[0] == "accepted"            # tombstoned id -> resurrect
    assert rows[1] == "replayed"            # live id
    assert rows[9_000_001] == "dup_hist"    # live text, new id
    assert rows[9_000_002] == "accepted"    # DEAD text, new id
    assert rows[9_000_003] == "dup_batch"   # loses min-id race to doc 9


def test_tombstone_ingest_deliberately_not_registered_yet():
    """The queue decision itself is pinned: the registry is at the
    150/150 rotation ceiling, and the r15 window slot comes from retiring
    rfm_purchase_segments_approx (r12-green cohort). When r15 executes
    that retirement, flip @_register on and delete this test."""
    assert "docs_tombstone_ingest" not in REGISTRY
    assert "docs_tombstone_ingest" not in RETIRED_REGISTRY
    assert len(REGISTRY) == 150  # ceiling fully used; no free slot
    assert "rfm_purchase_segments_approx" in REGISTRY  # the named r15 slot
