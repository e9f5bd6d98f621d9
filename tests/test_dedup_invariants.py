"""Structural invariants of the r5 dedup-family operators at sf0.01.

The oracle gate proves value-equality against DuckDB; these pin the
properties a refactor could silently break while still matching a
similarly-broken oracle edit: span geometry, cluster well-formedness, and
the exactly-one-kept-per-cluster contract.
"""

from __future__ import annotations

import pytest

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
from real_time_flight_data_pipeline_spark.plans.llm_ext import _SPAN_N

from .conftest import SF_CORRECT


@pytest.fixture(scope="module")
def dup_spans(spark):
    return REGISTRY["docs_dup_spans"].builder(spark, SF_CORRECT).collect()


@pytest.fixture(scope="module")
def clusters(spark):
    return REGISTRY["docs_near_dup_clusters"].builder(spark, SF_CORRECT).collect()


@pytest.fixture(scope="module")
def keep_best(spark):
    return REGISTRY["docs_dedup_keep_best"].builder(spark, SF_CORRECT).collect()


def test_dup_spans_geometry(dup_spans):
    assert dup_spans, "sf0.01 corpus contains known duplicated spans"
    for r in dup_spans:
        # every span covers at least one full gram, spans are maximal and
        # disjoint so their union can't exceed the document
        assert r.n_dup_spans >= 1
        assert r.dup_tokens >= r.n_dup_spans * _SPAN_N
        assert r.dup_tokens <= r.n_tokens
        assert 0.0 < r.dup_frac <= 1.0


def test_clusters_well_formed(clusters):
    assert clusters
    by_cluster: dict[int, list] = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rows in by_cluster.items():
        members = {r.doc_id for r in rows}
        # component label is the minimum member id, present in its cluster
        assert cid == min(members)
        # clustered means paired: singletons are excluded by construction
        assert len(members) >= 2
        assert all(r.cluster_size == len(members) for r in rows)
        assert sum(1 for r in rows if r.is_canonical) == 1


def test_keep_best_exactly_one_per_cluster(keep_best, clusters):
    assert {r.doc_id for r in keep_best} == {r.doc_id for r in clusters}
    by_cluster: dict[int, list] = {}
    for r in keep_best:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for rows in by_cluster.values():
        kept = [r for r in rows if r.keep]
        assert len(kept) == 1
        # kept doc has the max quality proxy (doc_id tie-break -> min id)
        best = max(rows, key=lambda r: (r.n_chars, -r.doc_id))
        assert kept[0].doc_id == best.doc_id
