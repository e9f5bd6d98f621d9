"""Retired catalog queries stay verified (r8 slot reclamation).

The driver's rotation window has a hard budget of 150 registered queries
(test_driver_window.py pins ceil(N/50) <= 3 rounds max staleness). Round 8
retired six instrumentation twins whose measurement value is banked —
recall probes composing production queries, superseded multimodal stubs,
and the flat SemDeDup baseline of the winning 2-level variant. Retirement
moves them from the driver's CORRECTNESS gate to THIS file: the identical
oracle compare at sf0.01 every session, plus pinned floors for the measured
numbers the twins existed to produce (so a regression in the production
query they compose still fails loudly here).
"""

from __future__ import annotations

import pytest

from real_time_flight_data_pipeline_spark.plans.catalog import RETIRED_REGISTRY

from .conftest import SF_CORRECT, SF_SMOKE
from .oracle_harness import compare

_RETIRED = sorted(RETIRED_REGISTRY)

# The same keyless-but-bounded broadcast shapes documented in
# test_plan_audit._BNLJ_ALLOWED before retirement.
_BNLJ_ALLOWED = {
    "embedding_ivf_recall",  # composes embedding_topk_ivf, inherits its plan
    "embedding_ivf_recall_trained",  # composes k-means + IVF, bounded sides
    "docs_lsh_recall",  # 1-row truth-count x 1-row hit-count
    "embedding_pq_adc_recall",  # 1-row query-vector broadcast (exact-scan
    # baseline side), same shape as its active trained twin
    "embedding_topk_join",  # 8-row query-batch broadcast (the multi-query
    # brute-force baseline), same shape it carried while active
    "rfm_purchase_segments_approx",  # 1-row percentile-boundary broadcast
    # cross join, same shape it carried while active
}


def test_expected_retirees():
    """Retirement is deliberate, one-by-one — a query can only move here
    with a matching entry in this pinned list (and a banked-number floor
    below if it was a measurement probe)."""
    assert _RETIRED == [
        "docs_lsh_recall",
        # r16 (the pre-planned rotation): 48-bit SimHash signature
        # scaffolding whose _simhash_df core the still-active
        # docs_simhash_near_dup_pairs composes (its brute-force hamming
        # oracle keeps verifying the signatures); retired from the
        # r13-green cohort to free the window slot docs_curated_ingest
        # occupies (a never-verified addition enters the driver window
        # immediately, so the due cohort supplies it). The standalone
        # signature oracle compare keeps running here.
        "docs_simhash",
        "embedding_ivf_recall",
        "embedding_ivf_recall_trained",
        # r12 (shortlist #3): training-free ADC rung, superseded by the
        # still-active embedding_pq_adc_recall_trained; 0.3 floor banked.
        "embedding_pq_adc_recall",
        "embedding_semdedup",
        # r13 (shortlist #5): join-based brute-force top-k baseline whose
        # rung-0 contrast embedding_topk_cosine already provides; retired
        # from the r10-green cohort to free the window slot
        # docs_ingest_dedup occupies (a never-verified addition enters the
        # driver window immediately, so the oldest cohort supplies it).
        "embedding_topk_join",
        "multimodal_decode_stub",
        "multimodal_resize_framesample_stub",
        # r15 (shortlist #4, the pre-planned rotation): approx-percentile
        # twin of the still-active rfm_purchase_segments; retired from the
        # r12-green cohort to free the window slot docs_tombstone_ingest
        # occupies (a never-verified addition enters the driver window
        # immediately, so the due cohort supplies it). The GK-sketch
        # error-bound measurement stays pinned by the oracle compare here.
        "rfm_purchase_segments_approx",
        # r12 (shortlist #1): grouped-Arrow-UDF twin of the still-active
        # user_value_mad_native; the UDF-vs-builtin measurement lives in
        # test_udtf.py.
        "user_value_mad",
    ]


@pytest.mark.parametrize("name", _RETIRED)
def test_retired_oracle_match(spark, name):
    q = RETIRED_REGISTRY[name]
    ok, msg = compare(spark, SF_CORRECT, q.builder, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", _RETIRED)
def test_retired_plan_audit(spark, name):
    df = RETIRED_REGISTRY[name].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in _BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_banked_recall_floors(spark):
    """The measured ANN/LSH quality ladder the retired probes produced
    (r5-r7 CORRECTNESS rows): training-free IVF recall@10 = 0.3, trained
    codebook = 0.4 (the trained-PQ 0.5 rung lives on in the still-active
    embedding_pq_adc_recall_trained). LSH candidate recall vs exact-Jaccard
    ground truth = 1.0 at sf0.01 (every true pair shares a band). Floors,
    not equalities, so a better index never fails; a production regression
    in embedding_topk_ivf / docs_near_dup_pairs fails here."""
    ivf = (
        RETIRED_REGISTRY["embedding_ivf_recall"]
        .builder(spark, SF_CORRECT)
        .collect()[0]
    )
    assert ivf["recall_at_10"] >= 0.3, ivf
    trained = (
        RETIRED_REGISTRY["embedding_ivf_recall_trained"]
        .builder(spark, SF_CORRECT)
        .collect()[0]
    )
    assert trained["recall_at_10"] >= 0.4, trained
    assert trained["recall_at_10"] >= ivf["recall_at_10"], (ivf, trained)
    lsh = RETIRED_REGISTRY["docs_lsh_recall"].builder(spark, SF_CORRECT).collect()[0]
    assert lsh["n_true"] > 0, lsh
    assert lsh["recall"] >= 0.9, lsh
    pq = (
        RETIRED_REGISTRY["embedding_pq_adc_recall"]
        .builder(spark, SF_CORRECT)
        .collect()[0]
    )
    assert pq["recall_at_10"] >= 0.3, pq
