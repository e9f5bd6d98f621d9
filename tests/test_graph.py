"""connected_components unit tests on synthetic graphs.

The oracle gate (docs_near_dup_clusters vs a recursive-CTE closure) proves
the operator on the real LSH pair graph; these pin the graph core on shapes
that graph data may not exhibit every round: a chain long enough to force
several propagation rounds, multiple components, and an empty edge list.
"""

from __future__ import annotations

from real_time_flight_data_pipeline_spark.operators.graph import connected_components


def _components(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df, **kw).collect()
    return {r.node: r.component for r in rows}


def test_chain_collapses_to_min_label(spark):
    # 1-2-3-4-5-6: label 1 must travel 5 hops (several propagation rounds).
    got = _components(spark, [(i, i + 1) for i in range(1, 6)])
    assert got == {i: 1 for i in range(1, 7)}


def test_multiple_components_and_direction_independence(spark):
    # Edges given in arbitrary direction; two separate components.
    got = _components(spark, [(4, 2), (2, 7), (10, 9)])
    assert got == {2: 2, 4: 2, 7: 2, 9: 9, 10: 9}


def test_isolated_nodes_absent(spark):
    got = _components(spark, [(1, 2)])
    assert set(got) == {1, 2}


def test_empty_edge_list(spark):
    assert _components(spark, []) == {}


def test_max_iters_bounds_rounds_not_correctness_on_star(spark):
    # Star graph: converges in one round regardless of size.
    got = _components(spark, [(1, i) for i in range(2, 8)], max_iters=2)
    assert got == {i: 1 for i in range(1, 8)}
