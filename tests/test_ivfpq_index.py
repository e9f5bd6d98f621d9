"""Build-once / probe-many for IVF-PQ (r8 verdict ask #4, carried r9 #4).

The catalog's embedding_ivfpq_topk rebuilds its index in-query (so the
oracle can verify training); this pins the DEPLOYED shape: train+encode
persisted once by operators/ann_index.build_ivfpq_index, then probes that
(a) return the bit-identical top-k the oracle-verified catalog query
returns, (b) prune the corpus scan to the nprobe probed cell partitions
(static PartitionFilters — no other partition's files are opened), and
(c) never touch the raw embeddings table at probe time.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.operators.ann_index import (
    build_ivfpq_index,
    probe_cells,
    probe_ivfpq_index,
)
from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
from real_time_flight_data_pipeline_spark.sources.parquet import load_table

from .conftest import SF_CORRECT


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    build_ivfpq_index(spark, SF_CORRECT, path)
    return path


@pytest.fixture(scope="module")
def query_vec(spark):
    # The catalog query's query vector: corpus vec_id 0.
    row = (
        load_table(spark, SF_CORRECT, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("x"))
        .head()
    )
    return list(row.x)


def test_probe_matches_catalog_query(spark, index_path, query_vec):
    got = sorted(
        tuple(r) for r in probe_ivfpq_index(spark, index_path, query_vec).collect()
    )
    want = sorted(
        tuple(r)
        for r in REGISTRY["embedding_ivfpq_topk"].builder(spark, SF_CORRECT).collect()
    )
    assert got == want


def _scan_metrics(df, name: str) -> list[int]:
    plan = df._jdf.queryExecution().executedPlan()
    leaves = plan.collectLeaves()
    vals = []
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains(name):
            vals.append(m.apply(name).value())
    return vals


def test_probe_prunes_to_probed_partitions(spark, index_path, query_vec):
    n_cells = len(glob.glob(f"{index_path}/cells/cell=*"))
    assert n_cells > 4, "corpus must span more cells than nprobe"
    probed = probe_cells(spark, index_path, query_vec)
    assert len(probed) == 4

    # The literal IN must land as a partition filter on the cells scan...
    cand = spark.read.parquet(f"{index_path}/cells").filter(
        F.col("cell").isin(probed)
    )
    cand.collect()
    plan = cand._jdf.queryExecution().executedPlan().toString()
    part = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cell" in part

    # ...and the executed scan's OWN metric must count exactly the probed
    # partitions' files — the scanned-file-count assertion (r9 ask #4),
    # not a plan-string promise. inputFiles() can't show this: it lists
    # the relation pre-pruning.
    probed_files = sum(
        len(glob.glob(f"{index_path}/cells/cell={c}/*.parquet"))
        for c in probed
    )
    total_files = len(glob.glob(f"{index_path}/cells/cell=*/*.parquet"))
    num_files = _scan_metrics(cand, "numFiles")
    assert num_files == [probed_files]
    assert probed_files < total_files


def test_probe_is_training_free(spark, index_path, query_vec):
    """A probe's plan reads exactly three index tables — no k-means / PQ
    training stages (the catalog query's in-query build has ~10 extra
    aggregates); structurally: no scan outside the index path and no
    localCheckpoint barriers (training's signature in the plans)."""
    probe = probe_ivfpq_index(spark, index_path, query_vec)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "embeddings.parquet" not in plan
    # pq + cells; coarse is consumed by the bounded driver-side nprobe
    # collect, and the query slices are a LocalTableScan.
    assert plan.count("FileScan") == 2


def test_incremental_add_no_retrain(spark, tmp_path):
    """Build on a history slice, add the held-out batch with the persisted
    codebooks, and verify: (a) rows = history + batch, (b) every batch
    vector landed in its nearest persisted coarse cell (recomputed
    independently via probe_cells on the vector itself), (c) a probe
    whose exact clone arrived IN THE BATCH returns that clone at ADC
    distance equal to the original's — the added rows are first-class
    probe results, and the codebooks provably did not move."""
    from real_time_flight_data_pipeline_spark.operators.ann_index import (
        add_to_ivfpq_index,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings")
    hist_dir = str(tmp_path / "hist")
    emb.filter(F.col("vec_id") % 10 != 9).write.parquet(
        f"{hist_dir}/embeddings.parquet"
    )
    path = str(tmp_path / "index")
    build_ivfpq_index(spark, hist_dir, path)
    n_hist = spark.read.parquet(f"{path}/cells").count()

    clone_src = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("x"))
        .head()
        .x
    )
    batch = emb.filter(F.col("vec_id") % 10 == 9).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(
        spark.createDataFrame(
            [(9_000_000, [float(v) for v in clone_src])],
            "vec_id long, embedding array<double>",
        )
    )
    add_to_ivfpq_index(spark, path, batch)

    cells = spark.read.parquet(f"{path}/cells")
    n_batch = batch.count()
    assert cells.count() == n_hist + n_batch

    # (b) spot-check assignments: each sampled batch vector's partition
    # equals its nearest persisted coarse cell.
    sample = emb.filter(F.col("vec_id") % 10 == 9).limit(5).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    ).collect()
    placed = {
        r.vec_id: r.cell
        for r in cells.join(
            spark.createDataFrame(
                [(s.vec_id,) for s in sample], "vec_id long"
            ),
            "vec_id",
            "semi",
        ).collect()
    }
    for s in sample:
        assert placed[s.vec_id] == probe_cells(spark, path, list(s.x), 1)[0]

    # (c) the planted clone is a first-class probe result with the same
    # ADC distance as its source vector.
    top = probe_ivfpq_index(spark, path, [float(v) for v in clone_src], k=10)
    rows = {r.vec_id: r.adc_fp for r in top.collect()}
    assert 9_000_000 in rows and 0 in rows
    assert rows[9_000_000] == rows[0]


def test_batch_probe_bit_identical_to_single(spark, index_path):
    """r11 verdict #7: the multi-query probe scans the UNION of probed
    cells once and must return, per query, exactly the single-probe
    top-k (same ADC scores, same (adc_fp, vec_id) tie order)."""
    from real_time_flight_data_pipeline_spark.operators.ann_index import (
        probe_ivfpq_index_batch,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    vecs = {r.vec_id: list(r.x) for r in emb.limit(5).collect()}
    assert len(vecs) == 5
    batch = probe_ivfpq_index_batch(spark, index_path, vecs)
    got: dict[int, list] = {}
    for r in batch.collect():
        got.setdefault(r.qid, []).append((r.vec_id, r.cell, r.adc_fp))
    assert set(got) == set(vecs)
    for qid, vec in vecs.items():
        want = [
            tuple(r) for r in probe_ivfpq_index(spark, index_path, vec).collect()
        ]
        assert sorted(got[qid]) == sorted(want)
        assert len(got[qid]) == len(want)
    empty = probe_ivfpq_index_batch(spark, index_path, {})
    assert empty.columns == ["qid", "vec_id", "cell", "adc_fp"]
    assert empty.collect() == []
