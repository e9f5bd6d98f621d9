"""The candidate-broadcast size guard: above the limit the verify joins run
as shuffle joins and must produce identical results (no memory cliff path).
"""

from __future__ import annotations

from real_time_flight_data_pipeline_spark.plans import northstar
from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def _run_sorted(spark, name):
    return sorted(map(tuple, REGISTRY[name].builder(spark, SF).collect()))


def test_shuffle_fallback_matches_broadcast(spark, monkeypatch):
    broadcast_docs = _run_sorted(spark, "docs_near_dup_pairs")
    broadcast_emb = _run_sorted(spark, "embedding_near_dup_pairs")

    monkeypatch.setattr(northstar, "_BROADCAST_CAND_LIMIT", 0)
    assert _run_sorted(spark, "docs_near_dup_pairs") == broadcast_docs
    assert _run_sorted(spark, "embedding_near_dup_pairs") == broadcast_emb
    assert len(broadcast_docs) > 0 and len(broadcast_emb) > 0


def test_guard_hints_only_below_limit(spark):
    # Catalyst may still auto-broadcast a tiny side on its own (statistics
    # based) — the guard's contract is about the explicit hint only.
    df = spark.range(10).localCheckpoint(eager=True)
    over = northstar._broadcast_if_small(df, limit=5)
    assert "hint" not in over._jdf.queryExecution().logical().toString().lower()

    under = northstar._broadcast_if_small(df, limit=100)
    assert "hint" in under._jdf.queryExecution().logical().toString().lower()
