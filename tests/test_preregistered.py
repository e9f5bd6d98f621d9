"""Pre-registered catalog queries: implemented + oracle-verified now,
queued for a later round's registration (COVERAGE.md "Next catalog
addition").

The driver rotation budget allows at most ONE never-verified addition per
round when the oldest green cohort fills the rest of the window
(tests/test_driver_window.py); work beyond that budget is banked here —
the query and its DuckDB oracle ship and are verified every session, and
registration is a one-line decorator flip when a window slot opens.
"""

from __future__ import annotations

from real_time_flight_data_pipeline_spark.plans.catalog import (
    REGISTRY,
    RETIRED_REGISTRY,
)
from real_time_flight_data_pipeline_spark.plans.llm_ext import (
    _docs_near_dup_ingest_oracle,
    q_docs_near_dup_ingest,
)

from .conftest import SF_CORRECT, SF_SMOKE
from .oracle_harness import compare


def test_near_dup_ingest_oracle_match(spark):
    ok, msg = compare(
        spark, SF_CORRECT, q_docs_near_dup_ingest, _docs_near_dup_ingest_oracle()
    )
    assert ok, msg


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


def test_deliberately_not_registered_yet(spark):
    """The queue decision itself is pinned: registering this query THIS
    round would push a due query past the rotation's staleness ceiling.
    When a slot opens (r14), flip @_register on and delete this test."""
    assert "docs_near_dup_ingest" not in REGISTRY
    assert "docs_near_dup_ingest" not in RETIRED_REGISTRY
    assert len(REGISTRY) == 149  # exactly one free slot, reserved for it
