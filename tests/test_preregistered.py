"""Catalog queries banked ahead of their registration window (COVERAGE.md
"Next catalog addition") and the semantics pinned at banking time.

`docs_near_dup_ingest` was banked in r13 and registered in r14;
`docs_tombstone_ingest` was banked in r14 and registered in r15 — each
when its reserved slot opened (retiring `embedding_topk_join` and
`rfm_purchase_segments_approx` respectively, always from the due green
cohort). Once registered, a query's oracle match is covered by the
registry-wide gate (tests/test_oracle.py); what stays here is the
planted-status contract each was banked with, so the accept-classification
semantics can't drift under later refactors.
"""

from __future__ import annotations

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
from real_time_flight_data_pipeline_spark.plans.llm_ext import (
    q_docs_near_dup_ingest,
    q_docs_tombstone_ingest,
)

from .conftest import SF_SMOKE


def test_near_dup_ingest_registered():
    """r14 flipped @_register on (VERDICT r13 item 1): the query is in the
    active registry with its DuckDB oracle attached."""
    assert "docs_near_dup_ingest" in REGISTRY
    assert REGISTRY["docs_near_dup_ingest"].oracle is not None
    assert len(REGISTRY) == 150  # rotation ceiling fully used again


def test_tombstone_ingest_registered():
    """r15 flipped @_register on (VERDICT r14 item 1, the pre-planned
    rotation): registered with its DuckDB oracle, inside the 150 ceiling
    (the slot came from retiring rfm_purchase_segments_approx)."""
    assert "docs_tombstone_ingest" in REGISTRY
    assert REGISTRY["docs_tombstone_ingest"].oracle is not None
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
