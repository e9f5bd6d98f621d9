"""Direct unit tests for ``operators/similarity.cell_pairwise_dups``.

The kernel is the r9 physical substitution for the SemDeDup within-cell
self-join. The driver oracle gate at sf0.01 exercises only tiny cells, so
the multi-block Gram path (engages at cell size > block, ~1024 rows) and
its block-boundary masking ``g[r, : i0 + r + 1] = False`` previously ran
only under 100x wall-time smoke — no correctness assertion (r9 verdict
#2). An off-by-one there would silently drop or add dups only at scale.

Pinned here:

* multi-block result == unblocked reference == the exact Spark self-join
  form, on a cell with near-duplicate pairs planted exactly astride the
  1024-row block boundaries;
* HALF_UP fixed-point threshold behavior at exactly tau (binary-exact
  dot values, so no decimal-representation ambiguity);
* empty input, 1-member cells, multi-cell isolation;
* the HIGHER id of a qualifying pair is the dup regardless of the input
  row order (ids arrive unsorted).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.functions import vectors as V
from real_time_flight_data_pipeline_spark.operators import similarity as SIM

CELL_SCHEMA = "vec_id long, cid long, vn array<double>"


def _ref_dups(ids: np.ndarray, mat: np.ndarray, tau: float) -> set[int]:
    """Unblocked reference: one full Gram, same HALF_UP fixed-point rule."""
    scale = 1e6
    thr = int(round(tau * scale))
    order = np.argsort(ids, kind="stable")
    ids_s, m = ids[order], mat[order]
    g = np.floor(m @ m.T * scale + 0.5) >= thr
    dup = [bool(g[:j, j].any()) for j in range(len(ids_s))]
    return {int(i) for i, d in zip(ids_s, dup) if d}


def _run_kernel(spark, rows, tau):
    df = spark.createDataFrame(rows, schema=CELL_SCHEMA)
    out = SIM.cell_pairwise_dups(df, tau)
    return {r.vec_id for r in out.collect()}


def test_multiblock_matches_unblocked_reference(spark):
    """3000-row cell -> block = 1024 -> three Gram blocks. Near-identical
    pairs planted exactly astride both block boundaries (1023/1024,
    2047/2048), at the far corner (0, 2999), and adjacent within-block."""
    n, dim, tau = 3000, 8, 0.99
    rng = np.random.RandomState(7)
    mat = rng.randn(n, dim)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    for a, b in [(1023, 1024), (2047, 2048), (0, 2999), (500, 501)]:
        mat[b] = mat[a]
    ids = np.arange(n, dtype=np.int64)
    rows = [(int(i), 0, [float(x) for x in mat[i]]) for i in range(n)]
    got = _run_kernel(spark, rows, tau)
    want = _ref_dups(ids, mat, tau)
    # The planted clones guarantee the boundary-straddling pairs are live
    # test cases, not vacuous ones.
    assert {1024, 2048, 2999, 501} <= want
    assert got == want


def test_matches_exact_self_join_form(spark):
    """Kernel == the oracle's join form (round(dot, 6) >= tau, higher id
    is the dup) on a mixed two-cell input."""
    n, dim, tau = 80, 6, 0.95
    rng = np.random.RandomState(11)
    mat = rng.randn(n, dim)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    for a, b in [(3, 9), (40, 44), (44, 47)]:
        mat[b] = mat[a] + rng.randn(dim) * 1e-4
        mat[b] /= np.linalg.norm(mat[b])
    rows = [(int(i), int(i % 2), [float(x) for x in mat[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, schema=CELL_SCHEMA).cache()
    try:
        got = {r.vec_id for r in SIM.cell_pairwise_dups(df, tau).collect()}
        a, b = df.alias("a"), df.alias("b")
        join = (
            a.join(
                b,
                (F.col("a.cid") == F.col("b.cid"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .filter(F.round(V.dot(F.col("a.vn"), F.col("b.vn")), 6) >= tau)
            .select(F.col("b.vec_id").alias("vec_id"))
            .distinct()
        )
        want = {r.vec_id for r in join.collect()}
        assert want, "planted near-dups must make the join non-vacuous"
        assert got == want
    finally:
        df.unpersist()


def test_half_up_threshold_boundary(spark):
    """Binary-exact dots around tau = 0.5: 0.5 qualifies (>=), 0.5 - 2^-21
    rounds UP to the threshold under HALF_UP (it is >= 0.4999995), and
    0.5 - 2^-20 rounds below. All three values and their 1e6 products are
    exactly representable, so the expectation is engine-independent."""
    tau = 0.5
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [0.5, 0.0]),
        (3, 0, [0.5 - 2.0**-21, 0.0]),
        (4, 0, [0.5 - 2.0**-20, 0.0]),
    ]
    assert _run_kernel(spark, rows, tau) == {2, 3}


def test_empty_and_singleton_cells(spark):
    assert _run_kernel(spark, [], tau=0.9) == set()
    assert _run_kernel(spark, [(1, 0, [1.0, 0.0])], tau=0.9) == set()
    # two singleton cells holding identical vectors: still no dups
    assert (
        _run_kernel(spark, [(1, 0, [1.0, 0.0]), (2, 1, [1.0, 0.0])], tau=0.9)
        == set()
    )


def test_unsorted_ids_higher_id_is_dup(spark):
    """The higher id of a qualifying pair is the dup even when it arrives
    FIRST in the input — the kernel must sort by id, not trust row order."""
    rows = [
        (90, 0, [1.0, 0.0]),
        (5, 0, [1.0, 0.0]),
        (40, 0, [0.0, 1.0]),
    ]
    assert _run_kernel(spark, rows, tau=0.99) == {90}


@pytest.mark.parametrize("n", [1023, 1024, 1025])
def test_block_edge_cell_sizes(spark, n):
    """Cells at exactly the single-block/multi-block transition: the last
    row is a clone of the first, so the pair spans the full matrix."""
    dim, tau = 4, 0.99
    rng = np.random.RandomState(n)
    mat = rng.randn(n, dim)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    mat[n - 1] = mat[0]
    ids = np.arange(n, dtype=np.int64)
    rows = [(int(i), 0, [float(x) for x in mat[i]]) for i in range(n)]
    got = _run_kernel(spark, rows, tau)
    want = _ref_dups(ids, mat, tau)
    assert n - 1 in want
    assert got == want


def test_skew_guard_routes_big_cells_to_self_join(spark):
    """Cells above max_cell_rows must take the streaming self-join path
    and produce the EXACT same dup set as the kernel; small cells in the
    same input still take the kernel. Verified by result equality across
    the guarded, unguarded, and reference forms."""
    dim, tau = 4, 0.99
    rng = np.random.RandomState(3)
    rows = []
    mats = {}
    for cid, n in [(0, 60), (1, 7)]:  # cell 0 oversized under the test cap
        mat = rng.randn(n, dim)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        mat[n - 1] = mat[0]
        mat[n // 2] = mat[1]
        mats[cid] = mat
        base = cid * 1000
        rows += [
            (base + i, cid, [float(x) for x in mat[i]]) for i in range(n)
        ]
    df = spark.createDataFrame(rows, schema=CELL_SCHEMA).cache()
    try:
        guarded = SIM.cell_pairwise_dups(df, tau, max_cell_rows=20)
        want = set()
        for cid, mat in mats.items():
            ids = np.arange(len(mat), dtype=np.int64) + cid * 1000
            want |= _ref_dups(ids, mat, tau)
        got = {r.vec_id for r in guarded.collect()}
        assert got == want
        # unguarded kernel agrees (path choice never changes the dup set)
        unguarded = SIM.cell_pairwise_dups(df, tau, max_cell_rows=None)
        assert {r.vec_id for r in unguarded.collect()} == want
        # and the guarded plan actually contains BOTH paths: the Arrow
        # kernel (small cells) and a join (the oversized cell).
        plan = guarded._jdf.queryExecution().optimizedPlan().toString()
        assert "FlatMapGroupsInPandas" in plan or "_dups" in plan
        assert "Join" in plan
    finally:
        df.unpersist()


def test_skew_guard_noop_when_no_big_cells(spark):
    """With every cell under the cap, the guarded result equals the
    unguarded kernel result (the self-join branch is empty)."""
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [1.0, 0.0]),
        (3, 1, [0.0, 1.0]),
    ]
    got = _run_kernel(spark, rows, tau=0.99)
    assert got == {2}
