"""IVF x PQ composition (r8): measured recall ladder + pruning invariants.

embedding_ivfpq_topk is oracle-verified bit-for-bit by test_oracle.py; this
file banks the numbers the composition exists to produce (r7 verdict #2):
recall@10 vs the exact scan and vs flat trained-PQ at the SAME codebooks,
and the candidate-pruning fraction that is the whole point of routing.

Measured at sf0.01 (2026-08-14): exact=1.0 by definition, flat trained-PQ
recall@10 = 0.5, IVF-PQ = 0.4 with candidates pruned to 0.5 of the corpus
(nprobe=4 of K=8 cells) — cell pruning halves encode/ADC work for 0.1
recall (one flat-PQ top-10 member sits outside the probed cells). Floors
below are set at those measurements so an index regression fails loudly
while a better index never does.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.functions import vectors as V
from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
from real_time_flight_data_pipeline_spark.plans.llm_ext import (
    _KM_NPROBE,
    _km_assign,
    _km_load,
    _km_trained_centroids,
    _pq_adc_scores,
    _pq_centd,
    _pq_subs,
    _pq_trained_cents,
)

from .conftest import SF_CORRECT


@pytest.fixture(scope="module")
def ivfpq_rows(spark):
    return REGISTRY["embedding_ivfpq_topk"].builder(spark, SF_CORRECT).collect()


@pytest.fixture(scope="module")
def exact10(spark):
    e = _km_load(spark, SF_CORRECT)
    qfull = e.filter(F.col("vec_id") == 0).select(F.col("x").alias("qx"))
    ed2 = (
        V.dot(F.col("x"), F.col("x"))
        - 2 * V.dot(F.col("x"), F.col("qx"))
        + V.dot(F.col("qx"), F.col("qx"))
    )
    rows = (
        e.join(F.broadcast(qfull))
        .select("vec_id", F.round(ed2, 6).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    )
    return {r.vec_id for r in rows}


def test_recall_ladder_vs_exact_and_flat_pq(spark, ivfpq_rows, exact10):
    ids = {r.vec_id for r in ivfpq_rows}
    assert len(ids) == 10
    recall = len(ids & exact10) / 10
    assert recall >= 0.4, f"IVF-PQ recall@10 vs exact regressed: {recall}"
    # Flat trained-PQ at the SAME codebooks: scoring everything (no cell
    # prune) — the overlap isolates exactly what routing costs.
    e = _km_load(spark, SF_CORRECT)
    subs = _pq_subs(e)
    centd = _pq_centd(subs, _pq_trained_cents(subs))
    flat10 = {
        r.vec_id
        for r in _pq_adc_scores(subs, centd)
        .orderBy("adc_fp", "vec_id")
        .limit(10)
        .collect()
    }
    flat_recall = len(flat10 & exact10) / 10
    assert flat_recall >= 0.5, flat_recall
    assert recall >= flat_recall - 0.2, (recall, flat_recall)
    assert len(ids & flat10) / 10 >= 0.8, "routing diverged from flat PQ"


def test_candidates_actually_pruned(spark, ivfpq_rows):
    """Routing must score a strict subset of the corpus (~nprobe/K), and
    every returned hit must come from a probed cell."""
    e = _km_load(spark, SF_CORRECT)
    coarse = _km_trained_centroids(e).localCheckpoint(eager=False)
    cells = _km_assign(e, coarse)
    qx = e.filter(F.col("vec_id") == 0).select(F.col("x").alias("qx"))
    dq = (
        V.dot(F.col("qx"), F.col("qx"))
        - 2 * V.dot(F.col("qx"), F.col("cv"))
        + V.dot(F.col("cv"), F.col("cv"))
    )
    qc = (
        coarse.join(F.broadcast(qx))
        .select("cid", dq.alias("d"))
        .orderBy("d", "cid")
        .limit(_KM_NPROBE)
        .select(F.col("cid").alias("cell"))
    )
    probed = {r.cell for r in qc.collect()}
    assert len(probed) == _KM_NPROBE
    n = e.count()
    n_cand = (
        cells.select("vec_id", F.col("cid").alias("cell"))
        .join(F.broadcast(qc), "cell", "semi")
        .count()
    )
    assert n_cand < n, "no pruning happened"
    assert n_cand <= 0.75 * n, f"pruned only to {n_cand}/{n}"
    assert {r.cell for r in ivfpq_rows} <= probed
