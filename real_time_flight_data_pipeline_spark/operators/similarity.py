"""Similarity search over an embedding column (north-star operator).

Two tiers (SURVEY.md §7.2 step 6):

* ``topk_cosine`` — brute-force exact top-k for one query vector. The scan is
  embarrassingly parallel; Spark plans the ``ORDER BY sim DESC LIMIT k`` as
  TakeOrderedAndProject (per-partition heap + driver merge of k rows per
  partition) — no global sort, no shuffle of the data. This remains the
  correct *baseline* even at 100 TB: cost is one read of the corpus.
* ``topk_cosine_lsh`` — approximate scale path: deterministic random-
  hyperplane signatures bucket the corpus; only the query's bucket (and
  optionally neighboring probes) is scanned. Buckets are computable at write
  time and used as a partition/cluster key so a probe prunes partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V


def topk_cosine(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_decimals: int | None = 6,
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.

    ``sim_decimals`` rounds the reported similarity so results are stable
    across engines that sum in different float widths; ordering ties are
    broken by id for full determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = V.cosine(F.col(vec_col), q)
    if sim_decimals is not None:
        sim = F.round(sim, sim_decimals)
    return (
        embeddings.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def _hyperplane(dim: int, plane_idx: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a hash counter.

    Reproducible on any engine: component = (hash splitmix-style) mapped to
    [-1, 1). Quality is adequate for bucketing; no numpy RNG state involved.
    """
    comps = []
    x = (seed * 0x9E3779B97F4A7C15 + plane_idx * 0xBF58476D1CE4E5B9) & (2**64 - 1)
    for _ in range(dim):
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & (2**64 - 1)
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & (2**64 - 1)
        x = x ^ (x >> 31)
        comps.append((x / 2**63) - 1.0)
    return comps


def signature_col(
    vec_col: str, dim: int, n_planes: int = 16, seed: int = 42, plane_offset: int = 0
):
    """Random-hyperplane (SimHash-for-vectors) bucket id as a long column.

    ``plane_offset`` selects a disjoint plane family, so banded LSH can build
    B independent buckets from offsets 0, P, 2P, ... (one band each).

    Built as ONE ``F.expr`` over a generated SQL string rather than per-
    component ``F.lit`` Columns: the Column form costs dim x n_planes py4j
    round-trips of pure driver time (measured 3.5-8 s PER QUERY BUILD for
    4 bands x 9 planes x 64 dims at sf0.1 — more than the query's entire
    execution), where the string form is one JVM parse. The evaluated tree
    is identical: a sequential-fold dot per plane (``aggregate(zip_with)``,
    the same deterministic sum the DuckDB oracles' list_dot_product does)
    and bit = 2^(n_planes-1-p) on sign, so bucket values are bit-for-bit
    unchanged. Literals are emitted with repr() (shortest round-trip form)
    plus the ``D`` suffix, so each parses back to the exact IEEE double the
    driver computed.
    """
    terms = []
    for p in range(n_planes):
        comps = ", ".join(f"{c!r}D" for c in _hyperplane(dim, plane_offset + p, seed))
        dot = (
            f"aggregate(zip_with(CAST(`{vec_col}` AS ARRAY<DOUBLE>), "
            f"array({comps}), (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
        )
        bit = 1 << (n_planes - 1 - p)
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {bit}L ELSE 0L END)")
    return F.expr(" + ".join(terms))


def cell_pairwise_dups(
    cells: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "vn",
    cell_col: str = "cid",
    round_decimals: int = 6,
    max_cell_rows: int | None = 1_000_000,
) -> DataFrame:
    """Exact within-cell near-duplicate ids via a per-cell BLAS Gram kernel.

    Replaces the SemDeDup ``cells a JOIN cells b ON a.cid = b.cid AND
    a.id < b.id WHERE round(dot(a,b), 6) >= tau`` self-join with ONE
    ``applyInPandas`` over the cell key, computing each cell's pairwise
    Gram matrix with numpy/BLAS. Semantics are IDENTICAL (exact dots,
    HALF_UP fixed-point compare, higher-id member of a qualifying pair is
    the dup) — this is a physical-plan substitution, so the DuckDB oracle
    stays the plain exact self-join.

    Why this beats the self-join at 100 TB scale (r8 verdict #1: the
    within-cell O(n^2/K) pairwise term was the last near-linear segment
    exponent on the 100x curve):

    * the self-join shuffles the (id, cid, 64-double vn) cell table TWICE
      (both join sides) and materializes every candidate pair as a
      ~1 KB joined row before the dot even runs; the kernel shuffles the
      table ONCE (groupBy cid) and materializes no pair rows at all;
    * each pair dot costs ~64 interpreted Catalyst lambda steps
      (aggregate(zip_with)) in the join form vs a fused dgemm FLOP in the
      kernel — measured ~20x on the 100x corpus;
    * Arrow batches the transfer; the kernel is partition-local (a cell
      never spans tasks), so no new shuffle, no driver involvement.

    Memory: row-blocking bounds the Gram SCRATCH (<= ~32 MB per block
    regardless of cell size) — it does NOT bound the group itself.
    ``applyInPandas`` materializes the whole cell (ids + dim-double
    vectors, plus Arrow buffers) in one executor before ``_dups`` runs,
    so the real bound is max cell rows x (dim x 8 B x ~3) per executor
    core: ~1.5 GB for a 1M-member dim-64 cell. The SemDeDup caller keeps
    cells at ~n^(1/3) average members (K = n^(2/3)), far inside that.
    Against PATHOLOGICAL skew the guard is in code, not advice
    (r9 ADVICE): cells larger than ``max_cell_rows`` are routed to the
    exact streaming self-join form — same fixed-point compare, no
    whole-cell materialization, pair rows stream through the join — and
    the two paths' outputs union (cells are disjoint, so no overlap).
    The size pre-check is one map-combined count per cell (O(K) shuffled
    rows) plus two broadcast joins against the oversized-cell id list —
    empty by construction for the SemDeDup caller, which keeps the
    default guard on. Pass ``max_cell_rows=None`` to skip the pre-check
    entirely when the cell-size distribution is externally bounded.

    Fixed-point HALF_UP (floor(x*scale+0.5)) mirrors Spark's F.round /
    DuckDB's round for the positive-threshold compare; dots are IEEE
    doubles either way, and the existing round-6 convention absorbs
    summation-order differences cross-engine. Residual ulp risk: the
    engines round the DECIMAL expansion of the dot while this kernel
    scales in binary, so a dot whose decimal form sits on the opposite
    side of the x.5 boundary from its binary x*1e6 product could in
    principle flip vs the oracle. No such value has ever been observed
    in the gates (the dots that matter sit ~1e-2 from tau); noted here
    because this path gates hash-equality.
    """
    scale = float(10 ** round_decimals)
    thr = int(round(tau * scale))

    def _dups(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({id_col: np.empty(0, dtype=np.int64)})
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        mat = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        dup = np.zeros(n, dtype=bool)
        block = max(1, min(1024, 4_000_000 // n))
        for i0 in range(0, n, block):
            i1 = min(i0 + block, n)
            g = np.floor(mat[i0:i1] @ mat.T * scale + 0.5) >= thr
            for r in range(i1 - i0):  # keep only j > i (higher id is dup)
                g[r, : i0 + r + 1] = False
            dup |= g.any(axis=0)
        return pd.DataFrame({id_col: ids[dup].astype(np.int64)})

    def _kernel(df: DataFrame) -> DataFrame:
        return df.groupBy(cell_col).applyInPandas(
            _dups, schema=f"{id_col} long"
        )

    if max_cell_rows is None:
        return _kernel(cells)

    # Skew guard: route cells too large to materialize as one pandas
    # group to the streaming self-join. Both paths apply the same
    # fixed-point compare — floor(dot*scale + 0.5) >= thr — but the dot
    # itself is BLAS (batched, reassociated) on one path and Spark's
    # sequential fold on the other, so a pair whose product lands within
    # a last-ulp of a 1e-6 quantum boundary CAN in principle flip between
    # paths (r11 ADVICE: the earlier "never change the dup set" claim
    # overreached). The quantization makes that the only residual, the
    # same one the semdedup kernels carry.
    big_ids = (
        cells.groupBy(cell_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_cell_rows)
        .select(cell_col)
    )
    small_dups = _kernel(cells.join(F.broadcast(big_ids), cell_col, "anti"))
    big = cells.join(F.broadcast(big_ids), cell_col, "semi")
    a, b = big.alias("a"), big.alias("b")
    pair_dot = V.dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    big_dups = (
        a.join(
            b,
            (F.col(f"a.{cell_col}") == F.col(f"b.{cell_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(F.floor(pair_dot * scale + F.lit(0.5)) >= thr)
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    # Cells are disjoint across the two paths, so a plain union suffices.
    return small_dups.unionByName(big_dups)


def topk_cosine_ivf(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_range: tuple[int, int] = (1, 16),
    n_probe: int = 4,
    sim_decimals: int | None = 6,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    Classic two-level ANN structure (the second scale path next to LSH):

    1. coarse centroids — here a deterministic, training-free codebook: the
       corpus vectors whose ids fall in ``centroid_id_range`` (a real
       deployment would k-means them; the *structure* is identical);
    2. every vector is assigned to its nearest centroid (argmax cosine —
       one broadcast join against the tiny codebook, no shuffle of the
       corpus, O(K) dots per row);
    3. a query probes only its ``n_probe`` closest cells and ranks exactly
       within them. At scale ``cell`` is the partition key at write time,
       so a probe prunes (K - n_probe)/K of the corpus scan.

    Everything stays engine-side (centroids/probe cells are DataFrames, not
    driver floats), so the DuckDB oracle can state the same computation.
    """
    lo, hi = centroid_id_range
    # Norm hoisted to its own projection: referencing V.norm inside the
    # transform lambda would re-evaluate the O(dim) sum per element
    # (O(dim^2)/row) — same pattern as plans/northstar.py's near-dup block.
    normed = (
        embeddings.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
        )
        .withColumn("_n", V.norm(F.col("v")))
        .select(
            F.col(id_col),
            F.transform(F.col("v"), lambda x: x / F.col("_n")).alias("vn"),
        )
        .localCheckpoint(eager=False)
    )
    cents = normed.filter(F.col(id_col).between(lo, hi)).select(
        F.col(id_col).alias("cid"), F.col("vn").alias("cvn")
    )
    q = normed.filter(F.col(id_col) == query_id).select(F.col("vn").alias("qvn"))

    # nearest-centroid assignment: argmax(sim) with smallest-cid tie-break
    sim_c = V.dot(F.col("vn"), F.col("cvn"))
    assigned = (
        normed.join(F.broadcast(cents))
        .groupBy(id_col)
        .agg(
            F.max_by("cid", F.struct(sim_c.alias("s"), (-F.col("cid")).alias("t"))).alias("cell"),
            F.any_value("vn").alias("vn"),  # identical within the group
        )
    )
    qcells = (
        cents.join(F.broadcast(q))
        .select("cid", V.dot(F.col("cvn"), F.col("qvn")).alias("qsim"))
        .orderBy(F.desc("qsim"), F.col("cid"))
        .limit(n_probe)
        .select(F.col("cid").alias("cell"))
    )
    sim = V.dot(F.col("vn"), F.col("qvn"))
    if sim_decimals is not None:
        sim = F.round(sim, sim_decimals)
    return (
        assigned.join(F.broadcast(qcells), "cell", "semi")
        .join(F.broadcast(q))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def topk_cosine_lsh(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    sim_decimals: int | None = 6,
) -> DataFrame:
    """Approximate top-k: scan only rows sharing the query's LSH bucket.

    At scale the corpus is written partitioned by ``bucket`` so this probe
    reads 1/2^n_planes of the data (partition pruning), then ranks exactly
    within the bucket.
    """
    dim = len(query_vec)
    bucketed = embeddings.withColumn(
        "_bucket", signature_col(vec_col, dim, n_planes, seed)
    )
    # Query bucket computed driver-side with the same hyperplanes.
    qsig = 0
    for p in range(n_planes):
        plane = _hyperplane(dim, p, seed)
        d = sum(float(a) * b for a, b in zip(query_vec, plane))
        qsig = (qsig << 1) | (1 if d >= 0 else 0)
    cand = bucketed.filter(F.col("_bucket") == qsig).drop("_bucket")
    return topk_cosine(cand, query_vec, k, id_col, vec_col, sim_decimals)
