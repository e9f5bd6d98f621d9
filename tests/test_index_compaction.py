"""Compaction lifecycle of the persisted IVF-PQ index (r11 verdict #1/#2).

Micro-batch appends accrete small part-files inside cell partitions;
``compact_index_cells`` rewrites over-threshold cells via a staged swap
(stage fully -> rename live->old (A) -> rename staged->live (B)), with
``recover_compaction`` finishing or rolling back any interrupted swap.
These tests pin what the r11 round shipped untested:

- content preservation + file-count bound on a genuinely fragmented index,
- probe results bit-identical pre/post compaction,
- every crash state of the swap protocol recovered without loss,
- a FAILED (false-returning) Hadoop rename aborts loudly with zero data
  loss instead of deleting the only copy (r11 ADVICE, high),
- readers fail loud (not silently cell-less) on a crashed swap,
- the streaming maintainer actually invokes compaction between triggers.
"""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.operators import ann_index
from real_time_flight_data_pipeline_spark.operators.ann_index import (
    add_to_ivfpq_index,
    await_stable_cells,
    build_ivfpq_index,
    cell_file_counts,
    compact_index_cells,
    encode_batch,
    probe_ivfpq_index,
    recover_compaction,
)
from real_time_flight_data_pipeline_spark.sources.parquet import load_table
from real_time_flight_data_pipeline_spark.streaming.vector_index import (
    VectorIndexMaintainer,
    run_file_replay_vectors,
)

from .conftest import SF_CORRECT

N_APPENDS = 6  # single-row appends into ONE cell -> that many part-files


@pytest.fixture(scope="module")
def frag_base(spark, tmp_path_factory):
    """Built once per module: an index plus N single-row appends all
    landing in the SAME coarse cell (the most-populated held-out cell),
    so that cell's part-file count exceeds any small threshold. Tests
    copy the directory instead of rebuilding."""
    root = tmp_path_factory.mktemp("compaction")
    emb = load_table(spark, SF_CORRECT, "embeddings")
    hist_dir = str(root / "hist")
    emb.filter(F.col("vec_id") % 10 != 9).write.parquet(
        f"{hist_dir}/embeddings.parquet"
    )
    path = str(root / "index")
    build_ivfpq_index(spark, hist_dir, path)

    held = emb.filter(F.col("vec_id") % 10 == 9).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    enc = encode_batch(spark, path, held).localCheckpoint(eager=True)
    hot_cell, hot_ids = None, []
    for r in (
        enc.groupBy("cell")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
        .orderBy(F.size("ids").desc(), "cell")
        .collect()
    ):
        if len(r.ids) >= 2 * N_APPENDS:
            hot_cell, hot_ids = int(r.cell), [int(i) for i in r.ids]
            break
    assert hot_cell is not None, "need a cell with enough held-out rows"
    for vid in hot_ids[:N_APPENDS]:
        add_to_ivfpq_index(
            spark, path, held.filter(F.col("vec_id") == vid)
        )
    # a query vector whose nearest cell IS the fragmented cell:
    qvec = list(
        held.filter(F.col("vec_id") == hot_ids[0]).head().embedding
    )
    # rows of the hot cell NOT yet appended — fuel for the streaming test
    spare_ids = hot_ids[N_APPENDS : 2 * N_APPENDS]
    return path, hot_cell, qvec, spare_ids


@pytest.fixture()
def frag_index(frag_base, tmp_path):
    """A private copy of the fragmented index for destructive tests."""
    base_path, hot_cell, qvec, spare_ids = frag_base
    path = str(tmp_path / "index")
    shutil.copytree(base_path, path)
    return path, hot_cell, qvec, spare_ids


def _content(spark, path):
    return sorted(
        (r.vec_id, int(r.cell), tuple(r.codes))
        for r in spark.read.parquet(f"{path}/cells").collect()
    )


def _probe(spark, path, qvec):
    return sorted(
        tuple(r) for r in probe_ivfpq_index(spark, path, qvec).collect()
    )


def test_compaction_preserves_content_and_bounds_files(spark, frag_index):
    path, hot_cell, qvec, _ = frag_index
    before_counts = cell_file_counts(spark, path)
    assert before_counts[hot_cell] > N_APPENDS  # genuinely fragmented
    before = _content(spark, path)
    probe_before = _probe(spark, path, qvec)

    over = compact_index_cells(spark, path, max_files_per_cell=3)
    assert hot_cell in over
    after_counts = cell_file_counts(spark, path)
    assert after_counts[hot_cell] == 1  # one task per cell -> one file
    for c, n in after_counts.items():
        assert n <= max(3, 1) or c not in over
    # untouched cells keep their exact file sets
    for c, n in before_counts.items():
        if c not in over:
            assert after_counts[c] == n
    assert _content(spark, path) == before  # bit-identical rows
    assert _probe(spark, path, qvec) == probe_before  # bit-identical probe
    assert not glob.glob(f"{path}/cells_old")
    assert not glob.glob(f"{path}/cells_staged")
    # idempotent: an immediate re-run finds nothing over threshold
    assert compact_index_cells(spark, path, max_files_per_cell=3) == []


def _crash_state(path, hot_cell, *, old=False, staged=False, live=True):
    """Materialize a mid-swap crash state for the hot cell by moving the
    directories the way the protocol would have (local-FS test double of
    the two-rename window)."""
    cell = f"cell={hot_cell}"
    if staged:
        shutil.copytree(
            f"{path}/cells/{cell}", f"{path}/cells_staged/{cell}"
        )
    if old:
        shutil.copytree(f"{path}/cells/{cell}", f"{path}/cells_old/{cell}")
    if not live:
        shutil.rmtree(f"{path}/cells/{cell}")


def test_recover_orphan_staging_only(spark, frag_index):
    """Crash AFTER staging, before rename (A): live untouched, orphan
    cells_staged dropped."""
    path, hot_cell, qvec, _ = frag_index
    before = _content(spark, path)
    _crash_state(path, hot_cell, staged=True)
    recover_compaction(spark, path)
    assert _content(spark, path) == before
    assert not glob.glob(f"{path}/cells_staged")


def test_recover_between_renames(spark, frag_index):
    """Crash BETWEEN (A) and (B): live missing, old + staged present.
    Recovery finishes rename (B) and drops the old copy."""
    path, hot_cell, qvec, _ = frag_index
    before = _content(spark, path)
    _crash_state(path, hot_cell, old=True, staged=True, live=False)
    recover_compaction(spark, path)
    assert _content(spark, path) == before
    assert not glob.glob(f"{path}/cells_old")
    assert not glob.glob(f"{path}/cells_staged")
    assert _probe(spark, path, qvec)  # probe healthy again


def test_recover_after_swap_before_cleanup(spark, frag_index):
    """Crash AFTER (B), before the cells_old cleanup: both copies exist;
    recovery drops the old one and keeps the live (new) one."""
    path, hot_cell, qvec, _ = frag_index
    before = _content(spark, path)
    _crash_state(path, hot_cell, old=True, live=True)
    recover_compaction(spark, path)
    assert _content(spark, path) == before
    assert not glob.glob(f"{path}/cells_old")


def test_recover_rollback_old_only(spark, frag_index):
    """The 'cannot happen' state (old present, live and staged missing):
    recovery still rolls the old copy back — content is never lost."""
    path, hot_cell, qvec, _ = frag_index
    before = _content(spark, path)
    _crash_state(path, hot_cell, old=True, live=False)
    recover_compaction(spark, path)
    assert _content(spark, path) == before
    assert not glob.glob(f"{path}/cells_old")


class _FailingRenameFS:
    """Wraps the real Hadoop FileSystem; ``rename`` returns False (the
    Hadoop failure mode — no exception) when the destination matches."""

    def __init__(self, real, fail_dst_substr: str):
        object.__setattr__(self, "_real", real)
        object.__setattr__(self, "_fail", fail_dst_substr)
        object.__setattr__(self, "n_failed", 0)

    def rename(self, src, dst):
        if self._fail in dst.toString():
            object.__setattr__(self, "n_failed", self.n_failed + 1)
            return False
        return self._real.rename(src, dst)

    def __getattr__(self, name):
        return getattr(self._real, name)


def test_failed_rename_aborts_without_data_loss(
    spark, frag_index, monkeypatch
):
    """r11 ADVICE (high): if rename (B) silently returns False after (A)
    moved the live cell into cells_old, the old code deleted cells_old —
    destroying the only copy. Now: fail loud, keep both swap dirs, and a
    subsequent recover_compaction (with a healthy FS) restores the full
    index."""
    path, hot_cell, qvec, _ = frag_index
    before = _content(spark, path)
    # The swap machinery is generic since r13 (operators/partstore); the
    # injection seam is its module-level _fs factory.
    from real_time_flight_data_pipeline_spark.operators import partstore

    real_fs = partstore._fs

    def flaky_fs(spark_, p):
        fs, jvm = real_fs(spark_, p)
        return _FailingRenameFS(fs, f"/cells/cell={hot_cell}"), jvm

    monkeypatch.setattr(partstore, "_fs", flaky_fs)
    with pytest.raises(OSError, match="rename failed"):
        compact_index_cells(spark, path, max_files_per_cell=3)
    monkeypatch.setattr(partstore, "_fs", real_fs)
    # the hot cell survived in cells_old (rename (A) parked it there)
    assert glob.glob(f"{path}/cells_old/cell={hot_cell}/*.parquet")
    recover_compaction(spark, path)
    assert _content(spark, path) == before
    assert not glob.glob(f"{path}/cells_old")
    assert not glob.glob(f"{path}/cells_staged")


def test_reader_fails_loud_on_crashed_swap(spark, frag_index):
    """r11 verdict #2: a probe that would silently miss a mid-swap cell
    must instead wait, then raise if the swap never completes (crashed
    compactor). After recovery the same probe returns the same rows as
    before the crash."""
    path, hot_cell, qvec, _ = frag_index
    probe_before = _probe(spark, path, qvec)
    _crash_state(path, hot_cell, old=True, staged=True, live=False)
    with pytest.raises(RuntimeError, match="mid-swap"):
        probe_ivfpq_index(spark, path, qvec).collect()
    # the maintainer's pruned dedup scan takes the same guard
    m = VectorIndexMaintainer(spark, path)
    emb = load_table(spark, SF_CORRECT, "embeddings")
    batch = emb.filter(F.col("vec_id") == 9).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    enc = encode_batch(spark, path, batch).localCheckpoint(eager=True)
    if int(enc.head().cell) == hot_cell:
        with pytest.raises(RuntimeError, match="mid-swap"):
            m._pruned_existing(enc)
    recover_compaction(spark, path)
    assert _probe(spark, path, qvec) == probe_before
    # a swap marker for OTHER cells does not block this probe:
    other = [
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(f"{path}/cells/cell=*")
        if int(p.rsplit("=", 1)[1]) != hot_cell
    ][0]
    _crash_state(path, other, old=True, live=True)  # post-(B) crash state
    assert _probe(spark, path, qvec) == probe_before
    await_stable_cells(spark, path, [hot_cell])  # hot cell is live: no wait


def test_streaming_maintainer_compacts_between_triggers(spark, frag_index):
    """r11 verdict #2 wiring: run_file_replay_vectors calls maybe_compact
    after each micro-batch append, so the fragmented hot cell is bounded
    by the threshold while every accepted row survives (acceptance
    simulated exactly from the same quantization the maintainer uses)."""
    import time

    path, hot_cell, qvec, spare_ids = frag_index
    assert cell_file_counts(spark, path)[hot_cell] > 3
    emb = load_table(spark, SF_CORRECT, "embeddings")
    spares = emb.filter(F.col("vec_id").isin(spare_ids)).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # exact acceptance simulation (ids are fresh; PQ-key collisions with
    # history or an earlier batch are legitimate rejections)
    key_of = {
        r.vec_id: (int(r.cell), tuple(r.codes))
        for r in encode_batch(spark, path, spares).collect()
    }
    keys = {
        (int(r.cell), tuple(r.codes))
        for r in spark.read.parquet(f"{path}/cells").collect()
    }
    expected = set()
    for vid in sorted(spare_ids):  # one row per micro-batch, in id order
        k = key_of[vid]
        if k not in keys:
            keys.add(k)
            expected.add(vid)

    before_ids = {
        r.vec_id
        for r in spark.read.parquet(f"{path}/cells").select("vec_id").collect()
    }
    spool = f"{path}_spool"
    for vid in sorted(spare_ids):
        spares.filter(F.col("vec_id") == vid).coalesce(1).write.mode(
            "append"
        ).parquet(spool)
        time.sleep(1.05)  # pin timestamp-ordered batch processing
    m = VectorIndexMaintainer(spark, path)
    run_file_replay_vectors(
        spark, spool, m, f"{path}_ckpt", compact_max_files=3
    )
    after = spark.read.parquet(f"{path}/cells")
    assert {
        r.vec_id for r in after.select("vec_id").collect()
    } == before_ids | expected
    assert after.count() == len(before_ids) + len(expected)
    counts = cell_file_counts(spark, path)
    # compaction ran between triggers: the hot cell never accretes past
    # threshold+1 (one post-append file before the next compact pass)
    assert counts[hot_cell] <= 4
    assert not glob.glob(f"{path}/cells_old")
    assert not glob.glob(f"{path}/cells_staged")


def test_strict_ids_catches_cross_batch_id_mutation(spark, frag_index):
    """r11 ADVICE (medium): a re-sent vec_id whose embedding mutated into
    a DIFFERENT coarse cell escapes the cell-pruned replay guard (the
    documented content-immutability contract); strict_ids=True runs the
    id guard against the unpruned id projection and rejects it."""
    path, _, _, _ = frag_index
    emb = load_table(spark, SF_CORRECT, "embeddings")

    def one(vid):
        return emb.filter(F.col("vec_id") == vid).select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )

    va = one(9)
    first = va.select(F.lit(8_000_000).alias("vec_id"), "embedding")
    ca = int(encode_batch(spark, path, first).head().cell)
    # find a corpus vector that encodes into a DIFFERENT coarse cell
    probe = emb.limit(50).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    other = next(
        r.vec_id
        for r in encode_batch(spark, path, probe).collect()
        if int(r.cell) != ca
    )
    mutated = one(other).select(F.lit(8_000_000).alias("vec_id"), "embedding")

    strict = VectorIndexMaintainer(spark, path, strict_ids=True)
    s1 = strict.ingest_batch(first)
    assert s1.n_added == 1
    s2 = strict.ingest_batch(mutated)  # same id, different cell
    assert s2.n_replayed == 1 and s2.n_added == 0
    dup_rows = (
        spark.read.parquet(f"{path}/cells")
        .filter(F.col("vec_id") == 8_000_000)
        .count()
    )
    assert dup_rows == 1  # invariant held even under contract violation


# ---------------------------------------------------------------------------
# strict_ids="auto" default (r12 verdict #5) + swap-marker guards on the
# strict full-index id scan (r12 ADVICE, medium).
# ---------------------------------------------------------------------------
def test_auto_default_is_strict_below_budget(spark, frag_index):
    """The default maintainer resolves the id guard to strict while the
    cells layout is under the byte budget — the cross-batch id-mutation
    hole is closed by default at small/medium index sizes — and records
    the mode in the batch stats."""
    path, _, _, spare_ids = frag_index
    emb = load_table(spark, SF_CORRECT, "embeddings")
    m = VectorIndexMaintainer(spark, path)  # default: "auto"
    assert m.strict_ids == "auto"
    assert 0 < m._cells_bytes() <= 1 << 30
    batch = emb.filter(F.col("vec_id") == spare_ids[0]).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    stats = m.ingest_batch(batch)
    assert stats.id_guard_mode == "strict"
    assert stats.n_added == 1


def test_auto_switches_to_pruned_over_budget(spark, frag_index, monkeypatch):
    """Above the id-scan budget, auto falls back to the cell-pruned guard
    (and says so in the stats): the strict scan's cost is bounded by
    design, never paid unboundedly on a huge index."""
    from real_time_flight_data_pipeline_spark.streaming import vector_index

    path, _, _, spare_ids = frag_index
    monkeypatch.setattr(vector_index, "_STRICT_ID_SCAN_MAX_BYTES", 0)
    emb = load_table(spark, SF_CORRECT, "embeddings")
    m = VectorIndexMaintainer(spark, path)
    batch = emb.filter(F.col("vec_id") == spare_ids[0]).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    stats = m.ingest_batch(batch)
    assert stats.id_guard_mode == "pruned"
    assert stats.n_added == 1


def test_crashed_swap_heals_at_ingest_and_strict_scan_sees_all_ids(
    spark, frag_index
):
    """A crashed compaction swap that parked a NON-batch cell in cells_old
    passes the per-cell guard (which only checks the batch's cells) but
    would silently hide that cell's ids from the strict full-index scan
    (r12 ADVICE, medium). The maintainer is the store's single writer, so
    ingest HEALS the crash first (without this the streaming loop wedges:
    every replayed batch would fail before maybe_compact's recovery runs),
    and the strict scan then sees the recovered cell's ids — a replayed id
    from the previously-parked cell is classified replayed, never
    re-appended. Readers (probes) still fail loud on the same state —
    pinned by test_reader_fails_loud_on_crashed_swap."""
    import glob as _glob
    import os

    path, hot_cell, _, spare_ids = frag_index
    emb = load_table(spark, SF_CORRECT, "embeddings")
    before = _content(spark, path)
    batch = emb.filter(F.col("vec_id") == spare_ids[0]).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # park a cell OTHER than the batch's target cell in cells_old,
    # simulating a compactor crash between rename (A) and rename (B)
    enc_cell = int(encode_batch(spark, path, batch).head().cell)
    victim = next(
        c for c in cell_file_counts(spark, path) if c != enc_cell
    )
    os.makedirs(f"{path}/cells_old", exist_ok=True)
    os.rename(
        f"{path}/cells/cell={victim}", f"{path}/cells_old/cell={victim}"
    )
    strict = VectorIndexMaintainer(spark, path, strict_ids=True)
    stats = strict.ingest_batch(batch)
    assert stats.n_added == 1 and stats.id_guard_mode == "strict"
    assert not _glob.glob(f"{path}/cells_old")  # healed, not bypassed
    # recovered content intact + exactly the one new row
    after = _content(spark, path)
    assert len(after) == len(before) + 1
    assert set(before) <= set(after)
    # a replay of an id that lived in the PARKED cell adds nothing: the
    # strict scan sees the recovered cell (the r12 ADVICE violation case)
    victim_id = next(v for v, c, _ in before if c == victim)
    replay = emb.filter(F.col("vec_id") == victim_id).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    s2 = strict.ingest_batch(replay)
    assert s2.n_replayed == 1 and s2.n_added == 0


def test_strict_ids_rejects_bad_value(spark, tmp_path):
    with pytest.raises(ValueError, match="strict_ids"):
        VectorIndexMaintainer(spark, str(tmp_path), strict_ids="yes")


def test_partstore_guard_helpers(spark, tmp_path):
    """has_swap_marker / verify_stable_after / assert_no_swap_marker agree
    on the marker state and fail loud only when it exists."""
    import os

    from real_time_flight_data_pipeline_spark.operators import partstore as PS

    root = str(tmp_path / "store")
    os.makedirs(root)
    assert PS.has_swap_marker(spark, root) is False
    PS.verify_stable_after(spark, root)          # no marker: passes
    PS.assert_no_swap_marker(spark, root)        # no marker: passes
    os.makedirs(f"{root}_old")
    assert PS.has_swap_marker(spark, root) is True
    with pytest.raises(RuntimeError, match="swap marker"):
        PS.verify_stable_after(spark, root)
    with pytest.raises(RuntimeError, match="swap marker"):
        PS.assert_no_swap_marker(spark, root)


def test_parked_protocol_classification(spark, tmp_path):
    """r15 ADVICE (medium): the swap protocol is adjudicated from the
    PARKED entries themselves — gen= sub-dirs mean tiered, parked files
    mean flat (whole-partition), an entry-less marker is the ambiguous
    mkdirs-to-first-rename window — never from the live tree."""
    import os

    from real_time_flight_data_pipeline_spark.operators import partstore as PS

    root = str(tmp_path / "s")
    os.makedirs(f"{root}/cell=0")
    assert PS.parked_protocol(spark, root, "cell") == "none"
    os.makedirs(f"{root}_old")
    assert PS.parked_protocol(spark, root, "cell") == "empty"
    os.makedirs(f"{root}_old/cell=0")
    assert PS.parked_protocol(spark, root, "cell") == "empty"
    with open(f"{root}_old/cell=0/part-000.parquet", "w") as f:
        f.write("x")
    assert PS.parked_protocol(spark, root, "cell") == "flat"
    os.makedirs(f"{root}_old/cell=1/gen=3")
    assert PS.parked_protocol(spark, root, "cell") == "tiered"


def test_marker_guard_conservative_on_ambiguous(spark, tmp_path):
    """r15 ADVICE (medium) + r16 ADVICE (low): _marker_is_tiered must
    never silently guess 'flat' — an ambiguous marker (nothing parked
    yet) resolves to the coarse tiered wait FIRST, with the caller's
    budget honored (adjudication retries spend from the same budget, the
    budgets do not stack). But a marker that stays EMPTY through the
    whole coarse budget is a parked-nothing crash skeleton (live tree
    complete by protocol), so the guard falls through to the per-cell
    probe instead of blocking every reader until the writer's next
    recovery: a complete live tree passes, a genuinely missing cell
    still fails loud. A positively-flat marker skips the coarse wait
    entirely."""
    import os
    import time

    from real_time_flight_data_pipeline_spark.operators.ann_index import (
        _adjudicate_marker,
        _marker_is_tiered,
    )

    path = str(tmp_path / "idx")
    os.makedirs(f"{path}/cells/cell=0")
    os.makedirs(f"{path}/cells_old")  # marker present, nothing parked
    assert _adjudicate_marker(spark, f"{path}/cells", retries=0) == "empty"
    assert _marker_is_tiered(spark, f"{path}/cells", retries=0) is True
    # live tree complete: after the coarse wait times out on the
    # persistently-empty marker, the per-cell probe passes (availability)
    t0 = time.monotonic()
    await_stable_cells(
        spark, path, [0], retries=1, wait_sec=0.05, marker_wait_sec=0.1
    )
    elapsed = time.monotonic() - t0
    assert elapsed < 5  # the budget was the caller's, not 10 s
    # a genuinely missing cell still fails loud on the same path
    with pytest.raises(RuntimeError):
        await_stable_cells(
            spark, path, [7], retries=1, wait_sec=0.05, marker_wait_sec=0.1
        )

    # a parked gen level (tiered crash) still blocks loud — the
    # coarse wait is the only guard that can see it
    os.makedirs(f"{path}/cells_old/cell=0/gen=2")
    with open(f"{path}/cells_old/cell=0/gen=2/part-000.parquet", "w") as f:
        f.write("x")
    assert _adjudicate_marker(spark, f"{path}/cells", retries=0) == "tiered"
    with pytest.raises(RuntimeError, match="persists"):
        await_stable_cells(
            spark, path, [0], retries=1, wait_sec=0.05, marker_wait_sec=0.1
        )
    import shutil

    shutil.rmtree(f"{path}/cells_old/cell=0")

    # flat-parked entries adjudicate flat -> per-cell guard (cell 0 live,
    # so the guard passes despite the marker)
    os.makedirs(f"{path}/cells_old/cell=1")
    with open(f"{path}/cells_old/cell=1/part-000.parquet", "w") as f:
        f.write("x")
    assert _adjudicate_marker(spark, f"{path}/cells", retries=0) == "flat"
    assert _marker_is_tiered(spark, f"{path}/cells", retries=0) is False
    await_stable_cells(spark, path, [0], retries=0, wait_sec=0.01)
