"""connected_components unit tests on synthetic graphs.

The oracle gate (docs_near_dup_clusters vs a recursive-CTE closure) proves
the operator on the real LSH pair graph; these pin the graph core on shapes
that graph data may not exhibit every round: a chain long enough to force
several propagation rounds, multiple components, and an empty edge list.
Both fixpoint algorithms (min-label propagation and large-star/small-star)
are run through the same cases plus seeded random graphs against a local
union-find ground truth.
"""

from __future__ import annotations

import random
import warnings

import pytest

from real_time_flight_data_pipeline_spark.operators.graph import (
    connected_components,
    connected_components_star,
)

ALGOS = [connected_components, connected_components_star]


def _components(spark, edges, algo=connected_components, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = algo(df, **kw).collect()
    return {r.node: r.component for r in rows}


def _union_find(edges):
    """Local ground truth: node -> min reachable node id."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("algo", ALGOS)
def test_chain_collapses_to_min_label(spark, algo):
    # 1-2-3-4-5-6: label 1 must travel 5 hops (several propagation rounds).
    got = _components(spark, [(i, i + 1) for i in range(1, 6)], algo)
    assert got == {i: 1 for i in range(1, 7)}


@pytest.mark.parametrize("algo", ALGOS)
def test_multiple_components_and_direction_independence(spark, algo):
    # Edges given in arbitrary direction; two separate components.
    got = _components(spark, [(4, 2), (2, 7), (10, 9)], algo)
    assert got == {2: 2, 4: 2, 7: 2, 9: 9, 10: 9}


@pytest.mark.parametrize("algo", ALGOS)
def test_isolated_nodes_absent(spark, algo):
    got = _components(spark, [(1, 2)], algo)
    assert set(got) == {1, 2}


@pytest.mark.parametrize("algo", ALGOS)
def test_empty_edge_list(spark, algo):
    assert _components(spark, [], algo) == {}


def test_max_iters_bounds_rounds_not_correctness_on_star(spark):
    # Star graph: converges in one round regardless of size.
    got = _components(spark, [(1, i) for i in range(2, 8)], max_iters=2)
    assert got == {i: 1 for i in range(1, 8)}


@pytest.mark.parametrize("seed", [7, 21, 99])
@pytest.mark.parametrize("algo", ALGOS)
def test_random_graphs_match_union_find(spark, algo, seed):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(80), rng.randrange(80))
        for _ in range(90)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _components(spark, edges, algo) == _union_find(edges)


def test_star_duplicate_and_reversed_edges(spark):
    # The canonicalization must absorb duplicates, reversals, self-loops.
    edges = [(1, 2), (2, 1), (2, 2), (1, 2), (3, 2)]
    assert _components(spark, edges, connected_components_star) == {
        1: 1,
        2: 1,
        3: 1,
    }


def test_label_propagation_warns_when_budget_exhausted(spark):
    # Chain of 8 needs ~7 propagation rounds; 2 are not enough.
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "src long, dst long"
    )
    with pytest.warns(RuntimeWarning, match="max_iters"):
        connected_components(df, max_iters=2).collect()


def test_star_collapses_long_chain_in_log_rounds(spark):
    """The pathological case min-label serializes on: a 10k-node chain
    (diameter 10k, min-label would need ~10k rounds). Large-star/small-star
    must converge within the O(log n) bound: ceil(log2 n) + 2 rounds (the
    +2 covers the initial canonicalization round and the fixpoint-confirm
    round). Measured: 15 rounds at n=10k vs 4 rounds on an LSH-shaped
    random graph — any algorithm needs >= log2(n) rounds to move
    information across a diameter-n chain, so the verdict's literal
    '<= 2x the LSH round count' is unattainable; the honest criterion is
    the logarithmic bound, recorded in COVERAGE.md scale notes."""
    n = 10_000
    chain = [(i, i + 1) for i in range(1, n)]
    stats: dict = {}
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any non-convergence warning fails
        got = _components(
            spark, chain, connected_components_star, max_iters=30, stats=stats
        )
    assert stats["converged"]
    assert got == {i: 1 for i in range(1, n + 1)}
    assert stats["rounds"] <= 16, stats  # ceil(log2(10000)) + 2
    # LSH-ish random graph: same algorithm, near-constant round count.
    rng = random.Random(5)
    lsh_like = [(rng.randrange(2000), rng.randrange(2000)) for _ in range(500)]
    lsh_like = [(a, b) for a, b in lsh_like if a != b]
    ref_stats: dict = {}
    ref = _components(
        spark, lsh_like, connected_components_star, stats=ref_stats
    )
    assert ref == _union_find(lsh_like)
    assert ref_stats["rounds"] <= 6, ref_stats


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered wedges) vs brute force.
# ---------------------------------------------------------------------------
from real_time_flight_data_pipeline_spark.plans.llm_ext import (  # noqa: E402
    triangle_counts_from,
)


def _brute_triangles(edges):
    """Local ground truth: per-vertex triangle counts via adjacency sets."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict[int, int] = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    for x in (u, v, w):
                        counts[x] = counts.get(x, 0) + 1
    return counts


def _spark_triangles(spark, edges):
    df = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges if a != b],
        "a_id long, b_id long",
    ).dropDuplicates()
    return {
        r.doc_id: r.n_triangles for r in triangle_counts_from(df).collect()
    }


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_triangles_match_brute_force_random(spark, seed):
    rng = random.Random(seed)
    edges = {
        (rng.randrange(30), rng.randrange(30)) for _ in range(120)
    }
    edges = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    assert _spark_triangles(spark, sorted(edges)) == _brute_triangles(
        sorted(edges)
    )


def test_triangles_clique_and_skew_hub(spark):
    # K5: every vertex is in C(4,2) = 6 triangles.
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    assert _spark_triangles(spark, k5) == {i: 6 for i in range(5)}
    # Star graph (hub 0): no triangles at all — and the degree ordering
    # means the hub generates ZERO wedges (every edge points INTO it).
    star = [(0, i) for i in range(1, 40)]
    assert _spark_triangles(spark, star) == {}
    # Star plus one rim edge: exactly one triangle.
    assert _spark_triangles(spark, star + [(1, 2)]) == {0: 1, 1: 1, 2: 1}


def test_triangles_empty_and_triangle_free(spark):
    assert _spark_triangles(spark, []) == {}
    path = [(i, i + 1) for i in range(20)]
    assert _spark_triangles(spark, path) == {}
