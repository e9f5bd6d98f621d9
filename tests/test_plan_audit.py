"""Plan-quality regression gate over the whole catalog (sf0.001).

Asserts the physical-plan properties the 100 TB design depends on: no
CartesianProduct anywhere, and BroadcastNestedLoopJoin only in the queries
whose keyless cross joins are intentionally bounded broadcasts (documented
in each query's description).
"""

from __future__ import annotations

import pytest

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY

from .conftest import SF_SMOKE

# Keyless-by-design cross joins against provably tiny sides (1-row query
# vector, 16-row IVF codebook, 8-row query batch, 1-row watermark scalar,
# 1-row corpus-count aggregate, K-row k-means centroid set).
_BNLJ_ALLOWED = {
    "embedding_topk_ivf",
    "embedding_topk_join",
    "scalar_subquery_watermark",
    "docs_tfidf_top_terms",
    "embedding_kmeans_2iter",
    "embedding_ivf_recall",  # composes embedding_topk_ivf, inherits its plan
    "embedding_ivf_recall_trained",  # composes k-means + IVF, same bounded sides
    "docs_mix_weights",  # 1-row grand-total broadcast cross join (scalar subquery)
}

_ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", _ALL)
def test_no_pathological_joins(spark, name):
    df = REGISTRY[name].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in _BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected BroadcastNestedLoopJoin — broadcast an "
            "equi-keyed side or add to the documented allowlist"
        )
