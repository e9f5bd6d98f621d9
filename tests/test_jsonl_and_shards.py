"""JSONL quarantine source + deterministic shard writer.

The two ends of the corpus lifecycle: ingest (JSONL with a visible
dead-letter path for broken lines — the T6 malformed-data policy applied
to file corpora) and export (hash-stable training shards with a
validated manifest).
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.operators.shards import (
    assign_shard,
    validate_manifest,
    write_sharded,
)
from real_time_flight_data_pipeline_spark.sources.jsonl import (
    CORRUPT_COL,
    DOCUMENTS_JSONL_SCHEMA,
    load_jsonl,
    split_corrupt,
)
from real_time_flight_data_pipeline_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def _write_fixture(tmp_path, n_good=50, n_bad=3) -> str:
    p = tmp_path / "corpus.jsonl"
    lines = [
        json.dumps(
            {"doc_id": i, "text": f"doc {i} text", "lang": "en", "source": f"src{i % 3}"}
        )
        for i in range(n_good)
    ]
    lines.insert(10, '{"doc_id": 900, "text": "truncated...')  # broken JSON
    lines.insert(25, "not json at all")
    lines.insert(40, '{"doc_id": "NaN-ish", "text": 42, "lang": {}}')  # type damage
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_quarantines_broken_lines(spark, tmp_path):
    path = _write_fixture(tmp_path)
    df = load_jsonl(spark, path, DOCUMENTS_JSONL_SCHEMA)
    clean, dead, parsed = split_corrupt(df)
    assert clean.count() == 50
    assert CORRUPT_COL not in clean.columns
    dead_rows = dead.collect()
    assert len(dead_rows) == 3
    # the raw line survives verbatim for forensics
    assert any("not json at all" in r.raw_line for r in dead_rows)
    # clean rows parsed fully typed
    got = clean.filter(F.col("doc_id") == 7).collect()[0]
    assert got.text == "doc 7 text" and got.source == "src1"
    # lifecycle contract: the caller releases the parse cache once both
    # branches are materialized (r6 ADVICE: long-lived ingest sessions
    # must not accumulate cached partitions)
    assert parsed.storageLevel.useMemory
    parsed.unpersist()
    assert not parsed.storageLevel.useMemory


def test_jsonl_rejects_schema_without_quarantine_column(spark):
    import pytest as _pytest
    from pyspark.sql import types as T

    with _pytest.raises(ValueError, match="_corrupt_record"):
        load_jsonl(
            spark, "/nonexistent", T.StructType([T.StructField("a", T.StringType())])
        )


def test_shard_assignment_is_stable_and_balanced(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    a = docs.select("doc_id", assign_shard(F.col("doc_id"), 8).alias("s"))
    b = docs.select("doc_id", assign_shard(F.col("doc_id"), 8).alias("s"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    sizes = [r.n for r in a.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert len(sizes) == 8
    assert max(sizes) < 2.5 * min(sizes)  # hash balance at n=100 docs


def test_write_sharded_manifest_validates_and_detects_drift(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "source"
    )
    out = str(tmp_path / "shards")
    manifest = write_sharded(docs, "doc_id", 4, out)
    rows = manifest.collect()
    assert {r.shard for r in rows} == {0, 1, 2, 3}
    assert sum(r.n_rows for r in rows) == docs.count()

    v = validate_manifest(spark, out, "doc_id")
    assert all(r.ok for r in v.collect())

    # membership is content-addressed: re-writing yields the same manifest
    manifest2 = write_sharded(docs, "doc_id", 4, str(tmp_path / "shards2"))
    assert sorted(map(tuple, manifest.collect())) == sorted(
        map(tuple, manifest2.collect())
    )

    # drift detection: corrupt one shard by deleting a file
    import glob
    import os

    victim = glob.glob(out + "/shard=2/*.parquet")[0]
    os.remove(victim)
    v2 = {r.shard: r.ok for r in validate_manifest(spark, out, "doc_id").collect()}
    assert v2[2] is False
    assert v2[0] and v2[1] and v2[3]


def _shard_files(out):
    import glob

    return {
        s: sorted(glob.glob(f"{out}/shard={s}/*.parquet")) for s in range(4)
    }


def test_rerun_rewrites_only_changed_shards(spark, tmp_path):
    """The incremental-write contract (r6 ADVICE: the docstring used to
    claim it while static overwrite rewrote everything): a re-run with one
    added document must leave every other shard's files byte-identical on
    disk, and an identical re-run must touch no data files at all."""
    from real_time_flight_data_pipeline_spark.operators.shards import (
        SHARD_COL,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "source"
    )
    out = str(tmp_path / "shards")
    write_sharded(docs, "doc_id", 4, out)
    before = _shard_files(out)
    sig_before = {
        s: [(f, os.path.getmtime(f), os.path.getsize(f)) for f in fs]
        for s, fs in before.items()
    }

    # identical re-run: zero data files rewritten
    write_sharded(docs, "doc_id", 4, out)
    sig_same = {
        s: [(f, os.path.getmtime(f), os.path.getsize(f)) for f in fs]
        for s, fs in _shard_files(out).items()
    }
    assert sig_same == sig_before

    # add ONE document: only its shard may change
    extra = spark.createDataFrame(
        [(999_999_999, "the new document", "srcX")], docs.schema
    )
    manifest = write_sharded(docs.unionByName(extra), "doc_id", 4, out)
    hit = assign_shard(F.lit(999_999_999).cast("long"), 4)
    hit_shard = spark.range(1).select(hit.alias("s")).head().s
    after = _shard_files(out)
    for s in range(4):
        if s == hit_shard:
            assert after[s] != before[s]  # rewritten (new file names)
        else:
            assert after[s] == before[s]  # byte-stable file set
    assert {r[SHARD_COL] for r in manifest.collect()} == {0, 1, 2, 3}
    v = validate_manifest(spark, out, "doc_id")
    assert all(r.ok for r in v.collect())

    # CONTENT change with the key set unchanged (r7 review finding: a
    # key-only fingerprint skipped these shards silently): editing one
    # doc's text must rewrite exactly its shard.
    docs2 = docs.unionByName(extra).withColumn(
        "text",
        F.when(F.col("doc_id") == 999_999_999, F.lit("EDITED")).otherwise(
            F.col("text")
        ),
    )
    before2 = _shard_files(out)
    write_sharded(docs2, "doc_id", 4, out)
    after2 = _shard_files(out)
    for s in range(4):
        if s == hit_shard:
            assert after2[s] != before2[s]  # content change detected
        else:
            assert after2[s] == before2[s]
    got = spark.read.parquet(out).filter(
        F.col("doc_id") == 999_999_999
    ).head()
    assert got.text == "EDITED"
    assert all(r.ok for r in validate_manifest(spark, out, "doc_id").collect())


def test_duplicated_row_edits_are_detected(spark, tmp_path):
    """XOR content hashes cancel for rows appearing an even number of
    times, making an edit of a duplicated pair invisible (r7 review
    finding); the sum-based fingerprint must catch it."""
    out = str(tmp_path / "shards")
    base = spark.createDataFrame(
        [(1, "old"), (1, "old"), (2, "other")], "doc_id long, text string"
    )
    write_sharded(base, "doc_id", 2, out)
    edited = spark.createDataFrame(
        [(1, "new"), (1, "new"), (2, "other")], "doc_id long, text string"
    )
    write_sharded(edited, "doc_id", 2, out)
    rows = spark.read.parquet(out).filter(F.col("doc_id") == 1).collect()
    assert [r.text for r in rows] == ["new", "new"]
    assert all(r.ok for r in validate_manifest(spark, out, "doc_id").collect())


# ---------------------------------------------------------------------------
# Fuzz: arbitrary byte-ish lines must never crash the loader — every line
# lands in exactly one of {clean, quarantined}.
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_line = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n\r"),
    max_size=80,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=st.lists(_line, min_size=1, max_size=12))
def test_jsonl_fuzz_total_partition(spark, tmp_path_factory, lines):
    tmp = tmp_path_factory.mktemp("fuzz")
    p = tmp / "fuzz.jsonl"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    df = load_jsonl(spark, str(p), DOCUMENTS_JSONL_SCHEMA)
    clean, dead, parsed = split_corrupt(df)
    n_clean, n_dead = clean.count(), dead.count()
    # Spark's JSON reader skips blank lines, where "blank" is Jackson's
    # ASCII whitespace (space/tab) — NOT Python's unicode strip(): a line
    # of U+00A0 or vertical tab is quarantined, not skipped (hypothesis
    # found exactly that). Every non-blank line lands in exactly one
    # bucket; a valid JSON *scalar* like `123` quarantines (not an
    # object).
    n_nonblank = sum(1 for ln in lines if ln.strip(" \t"))
    assert n_clean + n_dead == n_nonblank
    parsed.unpersist()


def test_corrupted_manifest_raises_not_full_rewrite(spark, tmp_path):
    """A corrupted _MANIFEST must RAISE on the next write, not silently
    fall back to a first-write full static rewrite that masks the
    corruption and discards the incremental guarantee (ADVICE r7). A
    genuinely missing manifest (first write) still proceeds."""
    import pathlib

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    out = str(tmp_path / "shards")
    write_sharded(docs, "doc_id", 4, out)  # first write: no manifest, ok
    mdir = pathlib.Path(out) / "_MANIFEST"
    for f in mdir.glob("*.parquet"):
        f.write_bytes(b"not a parquet file")
    with pytest.raises(Exception) as ei:
        write_sharded(docs, "doc_id", 4, out)
    assert "PATH_NOT_FOUND" not in str(ei.value)


def test_validate_manifest_pins_utc_session(spark, tmp_path):
    """The content fingerprint hashes to_json output whose timestamp
    formatting follows the session timezone: a validator session on a
    non-UTC timezone must not flag false drift (ADVICE r7 — both entry
    points pin UTC themselves)."""
    import datetime as dt

    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1 + i % 5, 12, 30)) for i in range(40)],
        "k long, ts timestamp",
    )
    out = str(tmp_path / "tshards")
    write_sharded(df, "k", 4, out)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        v = validate_manifest(spark, out, "k").collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert v and all(r.ok for r in v), v
