"""Append-only corpus store lifecycle (r12 verdict #1): the streaming
text tier now commits by bucketed APPENDS + threshold compaction (the
vector tier's model, machinery shared via operators/partstore), replacing
the per-micro-batch full-table pointer-flip rewrite. These tests pin:

- per-batch appends land O(batch) files; the corpus is never rewritten
  (untouched buckets keep their exact file sets across ingests),
- GENERATIONAL compaction (r13) preserves content and bounds per-level
  file counts reading only the merged level — gen>=1 files stay
  byte-identical in place, cascades converge, and every crash state of
  the tiered swap (staged-complete, staged-incomplete, orphan staging)
  recovers by the _SUCCESS rule without loss or duplication,
- readers fail loud (not silently holed) on a crashed swap,
- ingest classification stats match a planted batch exactly
  (replayed / dup_hist / dup_batch / accepted — the docs_ingest_dedup
  catalog query is the oracle-paired spec of the same contract),
- a half-append crash replays idempotently (T3, no ledger),
- the near-dup tier's bands-then-crash window converges on replay with
  no duplicate band rows (commit-order argument in streaming/corpus.py),
- the streaming loop compacts between triggers,
- the bucket-count meta guard refuses a mismatched reopen.

The swap protocol's own crash matrix (staged/old states, failed renames)
is pinned once on the shared machinery in test_index_compaction.py.
"""

from __future__ import annotations

import glob
import pathlib
import shutil

import pytest
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.operators import partstore as PS
from real_time_flight_data_pipeline_spark.sources.parquet import load_table
from real_time_flight_data_pipeline_spark.streaming.corpus import (
    CorpusStore,
    NearDupCorpusStore,
    run_file_replay_corpus,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )


def _content(store):
    return sorted(map(tuple, store.read().collect()))


def _split(spark, n_parts: int):
    """Deterministic micro-batch split of the documents table."""
    d = _docs(spark)
    return [
        d.filter(F.pmod(F.col("doc_id"), F.lit(n_parts)) == i)
        for i in range(n_parts)
    ]


def test_appends_never_rewrite_history(spark, tmp_path):
    """The r12 scale complaint, as an invariant: after batch N lands,
    batch N+1's ingest leaves every pre-existing part-file untouched —
    per-trigger write cost is O(batch), not O(corpus)."""
    store = CorpusStore(spark, str(tmp_path / "c"), n_buckets=8)
    b1, b2, b3 = _split(spark, 3)
    store.ingest_batch(b1)
    files_after_1 = set(glob.glob(f"{store.docs_root}/bucket=*/gen=*/*.parquet"))
    store.ingest_batch(b2)
    files_after_2 = set(glob.glob(f"{store.docs_root}/bucket=*/gen=*/*.parquet"))
    assert files_after_1 <= files_after_2  # old files untouched
    store.ingest_batch(b3)
    files_after_3 = set(glob.glob(f"{store.docs_root}/bucket=*/gen=*/*.parquet"))
    assert files_after_2 <= files_after_3
    # and the store still equals the batch-mode dedup of the whole input
    n_fp = _docs(spark).select(F.md5("text")).distinct().count()
    assert store.read().count() == n_fp


def test_compaction_preserves_content_and_bounds_files(spark, tmp_path):
    """Generational compaction (r13): every over-threshold (bucket, gen)
    level merges into ONE file in the next generation, reading only that
    level; untouched levels keep their exact file sets."""
    store = CorpusStore(spark, str(tmp_path / "c"), n_buckets=4)
    for b in _split(spark, 6):
        store.ingest_batch(b)
    counts = PS.gen_file_counts(spark, store.docs_root, "bucket")
    assert max(counts.values()) > 2  # genuinely fragmented (all in gen=0)
    assert all(g == 0 for (_, g) in counts)
    before = _content(store)
    big_files = {
        (v, g): set(
            glob.glob(f"{store.docs_root}/bucket={v}/gen={g}/*.parquet")
        )
        for (v, g), n in counts.items()
        if n <= 2
    }
    over = store.maybe_compact(max_files_per_bucket=2)
    assert over  # something merged
    after_counts = PS.gen_file_counts(spark, store.docs_root, "bucket")
    for v, g in over:
        assert (v, g) not in after_counts  # merged level is gone...
        assert after_counts.get((v, g + 1), 0) >= 1  # ...into gen+1
    assert max(after_counts.values()) <= 2
    for (v, g), files in big_files.items():
        if (v, g) not in over:  # untouched levels keep exact file sets
            assert (
                set(
                    glob.glob(
                        f"{store.docs_root}/bucket={v}/gen={g}/*.parquet"
                    )
                )
                == files
            )
    assert _content(store) == before
    assert not glob.glob(f"{store.docs_root}_old")
    assert not glob.glob(f"{store.docs_root}_staged")
    assert store.maybe_compact(max_files_per_bucket=2) == []  # idempotent


def test_tiered_merge_reads_only_the_merged_level(spark, tmp_path):
    """The write-amplification bound itself: merging gen=0 leaves every
    gen>=1 file byte-identical in place — the accumulated corpus is never
    read or rewritten (contrast: whole-bucket compaction re-writes every
    over-threshold bucket's full history)."""
    store = CorpusStore(spark, str(tmp_path / "c"), n_buckets=2)
    batches = _split(spark, 6)
    for b in batches[:3]:
        store.ingest_batch(b)
    store.maybe_compact(max_files_per_bucket=2)  # builds gen=1
    gen1_files = {
        f: (pathlib.Path(f).stat().st_size, pathlib.Path(f).stat().st_mtime)
        for f in glob.glob(f"{store.docs_root}/bucket=*/gen=1/*.parquet")
    }
    assert gen1_files
    for b in batches[3:]:
        store.ingest_batch(b)
    merged = store.maybe_compact(max_files_per_bucket=2)
    assert merged and all(g == 0 for (_, g) in merged)  # gen=1 untouched
    for f, (size, mtime) in gen1_files.items():
        st = pathlib.Path(f).stat()
        assert (st.st_size, st.st_mtime) == (size, mtime)
    n_fp = _docs(spark).select(F.md5("text")).distinct().count()
    assert store.read().count() == n_fp


def test_tiered_cascade_merges_upward(spark, tmp_path):
    """A merge that tips the next generation over the bound cascades to
    gen+2 within the same call, so file counts are bounded at EVERY level
    (the log_T levels argument needs this, not just gen=0)."""
    store = CorpusStore(spark, str(tmp_path / "c"), n_buckets=1)
    for b in _split(spark, 8):
        store.ingest_batch(b)
        store.maybe_compact(max_files_per_bucket=1)
    counts = PS.gen_file_counts(spark, store.docs_root, "bucket")
    assert max(counts.values()) <= 1
    assert max(g for (_, g) in counts) >= 2  # genuinely cascaded
    n_fp = _docs(spark).select(F.md5("text")).distinct().count()
    assert store.read().count() == n_fp


def test_tiered_crash_matrix(spark, tmp_path):
    """Every crash state of the tiered swap recovers without loss or
    duplication, adjudicated by the staged _SUCCESS marker:
      (a) parked level + staged complete -> finish (merged file lands in
          gen+1, parked level dropped);
      (b) parked level + staged incomplete -> roll back (parked files
          return to their level, staging dropped);
      (c) orphan staging, no marker -> dropped, store untouched."""
    import os

    store = CorpusStore(spark, str(tmp_path / "c"), n_buckets=1)
    for b in _split(spark, 4):
        store.ingest_batch(b)
    before = _content(store)
    root, pc = store.docs_root, "bucket"
    (v, g), _ = sorted(PS.gen_file_counts(spark, root, pc).items())[0]

    # (a) finish: stage a real merge, park the level, "crash" before the
    # rename-in; recovery must complete the swap.
    staged = f"{root}_staged/{pc}={v}/gen={g + 1}"
    spark.read.parquet(f"{root}/{pc}={v}/gen={g}").coalesce(1).write.mode(
        "overwrite"
    ).parquet(staged)
    os.makedirs(f"{root}_old/{pc}={v}", exist_ok=True)
    os.rename(f"{root}/{pc}={v}/gen={g}", f"{root}_old/{pc}={v}/gen={g}")
    with pytest.raises(RuntimeError, match="persists"):
        # readers fail loud meanwhile (the writer's ingest would heal)
        PS.await_no_swap_marker(spark, root, retries=1, wait_sec=0.01)
    PS.recover_tiered_compaction(spark, root, pc)
    assert _content(store) == before
    assert glob.glob(f"{root}/{pc}={v}/gen={g + 1}/*.parquet")
    assert not glob.glob(f"{root}_old") and not glob.glob(f"{root}_staged")

    # (b) roll back: park a level with an INCOMPLETE staging (no _SUCCESS).
    counts = PS.gen_file_counts(spark, root, pc)
    (v2, g2), _ = sorted(counts.items())[0]
    os.makedirs(f"{root}_staged/{pc}={v2}/gen={g2 + 1}", exist_ok=True)
    os.makedirs(f"{root}_old/{pc}={v2}", exist_ok=True)
    os.rename(f"{root}/{pc}={v2}/gen={g2}", f"{root}_old/{pc}={v2}/gen={g2}")
    PS.recover_tiered_compaction(spark, root, pc)
    assert _content(store) == before
    assert PS.gen_file_counts(spark, root, pc) == counts
    assert not glob.glob(f"{root}_old") and not glob.glob(f"{root}_staged")

    # (c) orphan staging only.
    os.makedirs(f"{root}_staged/{pc}={v2}/gen={g2 + 1}", exist_ok=True)
    PS.recover_tiered_compaction(spark, root, pc)
    assert _content(store) == before
    assert not glob.glob(f"{root}_staged")

    # healthy again: a replay adds nothing and compaction converges
    assert store.ingest_batch(_docs(spark)).n_accepted == 0
    store.maybe_compact(max_files_per_bucket=1)
    assert _content(store) == before


def test_reader_fails_loud_writer_heals_on_crashed_swap(spark, tmp_path):
    """A crashed tiered swap: READERS fail loud (a scan now would silently
    miss the parked level's rows), while the WRITER's ingest self-heals —
    the store has one writer, so a marker at ingest time can only be its
    own compactor's crash, and without the heal the streaming loop would
    wedge on every replayed batch before maybe_compact's recovery runs."""
    store = CorpusStore(spark, str(tmp_path / "c"), n_buckets=4)
    store.ingest_batch(_docs(spark))
    before = _content(store)
    gen_dir = sorted(glob.glob(f"{store.docs_root}/bucket=*/gen=0"))[0]
    rel = "/".join(gen_dir.rsplit("/", 2)[1:])  # bucket=N/gen=0
    # crash state: a gen level parked in _old, live level missing
    shutil.copytree(gen_dir, f"{store.docs_root}_old/{rel}")
    shutil.rmtree(gen_dir)
    with pytest.raises(RuntimeError, match="persists"):
        PS.await_no_swap_marker(spark, store.docs_root, retries=1,
                                wait_sec=0.01)
    s = store.ingest_batch(_docs(spark))  # writer: heals, replay no-op
    assert s.n_accepted == 0
    assert _content(store) == before      # parked rows recovered
    assert not glob.glob(f"{store.docs_root}_old")


def test_ingest_classification_stats(spark, tmp_path):
    """Planted batch classified exactly as docs_ingest_dedup specifies:
    re-sent id -> replayed; history text under a new id -> dup_hist;
    in-batch clone pair -> one accepted (lowest id), one dup_batch."""
    d = _docs(spark)
    hist = d.filter(F.col("doc_id") % 10 != 9)
    store = CorpusStore(spark, str(tmp_path / "c"), n_buckets=8)
    store.ingest_batch(hist)
    hist_fps = {
        r.f for r in hist.select(F.md5("text").alias("f")).distinct().collect()
    }

    held = d.filter(F.col("doc_id") % 10 == 9)
    # a held doc whose text is NOT already claimed by a history fingerprint
    fresh = held.withColumn("_f", F.md5("text")).filter(
        ~F.col("_f").isin(list(hist_fps))
    )
    fresh_row = fresh.select("doc_id", "text", "lang", "source").limit(1)
    hist_row = hist.limit(1)
    # a SECOND history row with a different text (else the dup_hist plant
    # would share the replayed row's fingerprint and collapse in-batch)
    hist_row2 = (
        hist.withColumn("_f", F.md5("text"))
        .filter(F.col("_f") != F.md5(F.lit(hist_row.head().text)))
        .select("doc_id", "text", "lang", "source")
        .limit(1)
    )

    def plant(src, new_id):
        return src.select(
            F.lit(new_id).cast("long").alias("doc_id"),
            "text",
            "lang",
            "source",
        )

    batch = (
        fresh_row
        .unionByName(hist_row)                    # replayed (id + text)
        .unionByName(plant(hist_row2, 900001))    # dup_hist (new id)
        .unionByName(plant(fresh_row, 900002))    # in-batch clone pair
        .unionByName(plant(fresh_row, 900003))
    )
    s = store.ingest_batch(batch)
    assert s.n_rows == 5
    assert s.n_replayed == 1
    assert s.n_dup_hist == 1
    # fresh_row + its two clones share a fingerprint: representative is
    # the ORIGINAL doc_id (lowest), the two plants lose the in-batch race
    assert s.n_dup_batch == 2
    assert s.n_accepted == 1
    accepted_ids = {r.doc_id for r in store.read().select("doc_id").collect()}
    assert int(fresh_row.head().doc_id) in accepted_ids
    assert 900002 not in accepted_ids and 900003 not in accepted_ids


def test_half_append_crash_replays_idempotently(spark, tmp_path):
    """A crash mid-append leaves some survivors committed; the replay's
    fingerprint anti-join re-adds only the missing rows and the store
    converges to the clean-run contents."""
    d = _docs(spark)
    clean = CorpusStore(spark, str(tmp_path / "clean"), n_buckets=8)
    clean.ingest_batch(d)

    store = CorpusStore(spark, str(tmp_path / "crash"), n_buckets=8)
    # simulate the half-append: commit only half the would-be survivors
    fp = store._fingerprinted(d)
    reps = store._in_batch_reps(fp)
    store._append_docs(reps.filter(F.col("doc_id") % 2 == 0))
    # replay the full batch through the normal path
    s = store.ingest_batch(d)
    assert s.n_accepted > 0  # the missing half landed
    assert _content(store) == _content(clean)
    # convergence is stable: one more replay adds nothing
    assert store.ingest_batch(d).n_accepted == 0


def test_near_dup_bands_then_crash_converges(spark, tmp_path):
    """Crash AFTER the band append, BEFORE the doc append (the commit
    order's one crash window): the replay re-accepts the doc — its ghost
    bands can't verify against it (absent from docs) — and the band
    re-append's (doc_id, band_idx) anti-join leaves no duplicate rows."""
    d = _docs(spark).filter(F.col("doc_id") < 60)
    clean = NearDupCorpusStore(spark, str(tmp_path / "clean"), n_buckets=8)
    clean.ingest_batch(d)

    store = NearDupCorpusStore(spark, str(tmp_path / "crash"), n_buckets=8)

    crashed = {"n": 0}
    real_append = CorpusStore._append_docs

    def crash_append(self, survivors):
        crashed["n"] += 1
        raise OSError("simulated crash between band append and doc append")

    CorpusStore._append_docs = crash_append
    try:
        with pytest.raises(OSError, match="simulated crash"):
            store.ingest_batch(d)
    finally:
        CorpusStore._append_docs = real_append
    assert crashed["n"] == 1
    assert store.read().count() == 0          # no docs committed
    assert store.read_bands().count() > 0     # ghost bands exist

    s = store.ingest_batch(d)                 # replay
    assert s.n_accepted > 0
    assert _content(store) == _content(clean)
    # band table converged too: same rows as the clean run, no dups
    got = sorted(map(tuple, store.read_bands().collect()))
    want = sorted(map(tuple, clean.read_bands().collect()))
    assert got == want


def test_streaming_loop_compacts_between_triggers(spark, tmp_path):
    """run_file_replay_corpus wires maybe_compact after each micro-batch:
    bucket file counts stay bounded by threshold+1 while contents match
    the batch-mode dedup."""
    import time

    d = _docs(spark)
    src = str(tmp_path / "src")
    for i in range(5):
        d.filter(F.pmod(F.col("doc_id"), F.lit(5)) == i).coalesce(
            1
        ).write.mode("append").parquet(src)
        time.sleep(1.05)  # pin timestamp-ordered batch processing
    store = CorpusStore(spark, str(tmp_path / "c"), n_buckets=4)
    run_file_replay_corpus(
        spark, src, store, str(tmp_path / "ckpt"), d.schema,
        compact_max_files=2,
    )
    counts = PS.gen_file_counts(spark, store.docs_root, "bucket")
    assert max(counts.values()) <= 3  # threshold + one post-append file
    n_fp = d.select(F.md5("text")).distinct().count()
    assert store.read().count() == n_fp
    assert not glob.glob(f"{store.docs_root}_old")
    assert not glob.glob(f"{store.docs_root}_staged")


def test_bucket_meta_guard(spark, tmp_path):
    root = str(tmp_path / "c")
    CorpusStore(spark, root, n_buckets=8)
    # default reopen adopts the stored spec
    assert CorpusStore(spark, root).n_buckets == 8
    with pytest.raises(ValueError, match="n_buckets"):
        CorpusStore(spark, root, n_buckets=16)
