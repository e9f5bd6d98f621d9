"""Vector-tier generational compaction behind a measured threshold (r13
verdict #7, closing COVERAGE's own 1000x caveat): whole-cell threshold
rewrites are O(cell bytes) per pass — free at every measured scale but
O(corpus/K) in the limit — so ``VectorIndexMaintainer(compaction="auto")``
flips a cell's layout to the corpus store's generational (LSM) tiering
when an over-threshold cell's bytes cross ``_CELL_TIER_MAX_BYTES``:
one-shot driver-rename migration (no data rewrite), appends land in
gen=0, compaction merges one level at a time, and every reader (probe,
dedup guards) keeps working transparently across the flip.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.operators.ann_index import (
    build_ivfpq_index,
    probe_ivfpq_index,
)
from real_time_flight_data_pipeline_spark.sources.parquet import load_table
from real_time_flight_data_pipeline_spark.streaming import vector_index as VI
from real_time_flight_data_pipeline_spark.streaming.vector_index import (
    VectorIndexMaintainer,
)

from .conftest import SF_SMOKE


def _index(spark, tmp_path, subset=None):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    built = emb.filter(subset) if subset is not None else emb
    src = str(tmp_path / "src")
    built.write.parquet(f"{src}/embeddings.parquet")
    path = str(tmp_path / "index")
    build_ivfpq_index(spark, src, path)
    return path, emb  # the FULL table — held batches draw beyond the build


def _held(emb, lo, hi):
    return emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _probe0(spark, path, emb):
    q = list(
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("x"))
        .head()
        .x
    )
    return {r.vec_id for r in probe_ivfpq_index(spark, path, q, k=5).collect()}


def test_auto_flips_to_tiered_when_budget_crossed(
    spark, tmp_path, monkeypatch
):
    path, emb = _index(spark, tmp_path, subset=F.col("vec_id") < 200)
    m = VectorIndexMaintainer(spark, path, compaction="auto")
    before = _probe0(spark, path, emb)
    m.ingest_batch(_held(emb, 200, 230))
    # under budget: whole-cell mode, layout stays flat
    m.maybe_compact(max_files_per_cell=1)
    assert not m._layout_is_tiered()

    monkeypatch.setattr(VI, "_CELL_TIER_MAX_BYTES", 0)
    m.ingest_batch(_held(emb, 230, 260))
    merged = m.maybe_compact(max_files_per_cell=1)
    assert m._layout_is_tiered()
    assert merged  # the budgeted pass itself ran tiered
    assert glob.glob(f"{path}/cells/cell=*/gen=*")
    assert not glob.glob(f"{path}/cells/cell=*/*.parquet")  # fully migrated

    # readers work transparently across the flip
    assert _probe0(spark, path, emb) == before
    # appends now land in gen=0 and replay stays idempotent
    s = m.ingest_batch(_held(emb, 200, 260))
    # ids that originally landed replay; ids originally dropped as
    # quantized dups are (correctly) dropped the same way again
    assert s.n_added == 0 and s.n_replayed + s.n_quantized_dup == 60
    s2 = m.ingest_batch(_held(emb, 260, 290))
    assert s2.n_added > 0
    ids = {
        r.vec_id
        for r in spark.read.parquet(f"{path}/cells").select("vec_id").collect()
    }
    assert set(range(260, 290)) <= ids
    # further tiered compaction keeps per-level bounds
    m.maybe_compact(max_files_per_cell=1)
    assert _probe0(spark, path, emb) == before


def test_forced_tiered_mode_from_the_start(spark, tmp_path):
    path, emb = _index(spark, tmp_path, subset=F.col("vec_id") < 200)
    m = VectorIndexMaintainer(spark, path, compaction="tiered")
    before = _probe0(spark, path, emb)
    m.ingest_batch(_held(emb, 200, 240))
    m.maybe_compact(max_files_per_cell=1)
    assert m._layout_is_tiered()
    assert _probe0(spark, path, emb) == before
    # tombstone fold works on the tiered layout too
    m.delete_vectors([0])
    assert 0 not in _probe0(spark, path, emb)
    m.ingest_batch(_held(emb, 240, 250))
    m.maybe_compact(max_files_per_cell=1)
    live = spark.read.parquet(f"{path}/cells").select("vec_id")
    assert live.filter(F.col("vec_id") == 0).count() <= 1  # dead or folded


def test_whole_mode_never_tiers(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(VI, "_CELL_TIER_MAX_BYTES", 0)
    path, emb = _index(spark, tmp_path, subset=F.col("vec_id") < 200)
    m = VectorIndexMaintainer(spark, path, compaction="whole")
    m.ingest_batch(_held(emb, 200, 230))
    m.maybe_compact(max_files_per_cell=1)
    assert not m._layout_is_tiered()
    assert not glob.glob(f"{path}/cells/cell=*/gen=*")


def test_delete_after_crashed_tiered_swap_recovers_without_loss(
    spark, tmp_path
):
    """Layout-aware recovery from EVERY mutating entry point (r14
    self-review): a crashed TIERED swap parks a gen sub-level while the
    cell dir stays present; the whole-cell recovery protocol would
    misread that as an already-completed swap and DELETE the parked
    level. delete_vectors must recover with the tiered protocol and keep
    every row."""
    import shutil

    path, emb = _index(spark, tmp_path, subset=F.col("vec_id") < 200)
    m = VectorIndexMaintainer(spark, path, compaction="tiered")
    m.ingest_batch(_held(emb, 200, 240))
    m.maybe_compact(max_files_per_cell=1)
    assert m._layout_is_tiered()
    before = sorted(
        r.vec_id
        for r in spark.read.parquet(f"{path}/cells").select("vec_id").collect()
    )
    # crash state: one gen level parked under cells_old, live level gone
    gen_dir = sorted(glob.glob(f"{path}/cells/cell=*/gen=*"))[0]
    rel = "/".join(gen_dir.rsplit("/", 2)[1:])
    shutil.copytree(gen_dir, f"{path}/cells_old/{rel}")
    shutil.rmtree(gen_dir)

    assert m.delete_vectors([before[0]]) == 1  # heals first, then deletes
    assert not glob.glob(f"{path}/cells_old")
    live = sorted(
        r.vec_id
        for r in spark.read.parquet(f"{path}/cells").select("vec_id").collect()
    )
    assert live == before  # parked level restored, nothing lost


def test_recovery_protocol_from_parked_entries_not_live_tree(spark, tmp_path):
    """r15 ADVICE (low): a crashed tiered swap can park the ONLY visible
    gen level(s), leaving the live tree gen-free — protocol detection
    from the live layout would then pick the whole-cell recovery, whose
    first arm (live cell dir present) DELETES the parked level:
    permanent data loss. _recover_if_crashed now reads the protocol from
    the parked entries themselves and restores every row."""
    import os
    import shutil

    path, emb = _index(spark, tmp_path, subset=F.col("vec_id") < 200)
    m = VectorIndexMaintainer(spark, path, compaction="tiered")
    m.ingest_batch(_held(emb, 200, 240))
    m.maybe_compact(max_files_per_cell=1)
    assert m._layout_is_tiered()
    before = {
        r.vec_id
        for r in spark.read.parquet(f"{path}/cells").select("vec_id").collect()
    }
    # crash state: EVERY gen level parked; the live tree shows no gen=
    for gen_dir in sorted(glob.glob(f"{path}/cells/cell=*/gen=*")):
        rel = "/".join(gen_dir.rsplit("/", 2)[1:])
        os.makedirs(os.path.dirname(f"{path}/cells_old/{rel}"), exist_ok=True)
        shutil.move(gen_dir, f"{path}/cells_old/{rel}")
    assert not glob.glob(f"{path}/cells/cell=*/gen=*")
    assert not m._layout_is_tiered()  # the live tree lies about protocol

    s = m.ingest_batch(_held(emb, 240, 250))  # heals first, then ingests
    assert not glob.glob(f"{path}/cells_old")
    live = {
        r.vec_id
        for r in spark.read.parquet(f"{path}/cells").select("vec_id").collect()
    }
    assert before <= live  # every parked row restored, nothing lost
    assert s.n_added + s.n_replayed + s.n_quantized_dup == 10
