"""Catalog queries that were banked before registration (COVERAGE.md
"Next catalog addition") and the semantics pinned at banking time.

`docs_near_dup_ingest` was implemented + oracle-verified in r13 and
registered in r14 when its reserved driver-window slot opened; its oracle
match is now covered by the registry-wide gate (tests/test_oracle.py).
What stays here is the planted-status contract — the part of the accept
contract the row-count/hash oracle alone can't make legible.
"""

from __future__ import annotations

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
from real_time_flight_data_pipeline_spark.plans.llm_ext import (
    q_docs_near_dup_ingest,
)

from .conftest import SF_SMOKE


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
