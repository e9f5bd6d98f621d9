"""Compressed JSONL shards (r16): gzip corpora read through the same
quarantine contract as plain shards, and the non-splittability hazard is
pinned as a fact, then repaired by the explicit rebalance path.

Why this is a test and not trivia: at corpus scale a single 10 GB
.jsonl.gz becomes ONE input task (gzip cannot be split), so a reader
that silently inherits that serializes every CPU-heavy downstream stage
on one core. load_jsonl_shards makes the repair explicit — the pinned
behaviors here are (a) byte-identical parse results vs the uncompressed
twin, quarantine column included, (b) the one-task-per-gz-file fact
itself, and (c) the rebalance restoring session parallelism."""

from __future__ import annotations

import gzip

from real_time_flight_data_pipeline_spark.sources.jsonl import (
    CORRUPT_COL,
    DOCUMENTS_JSONL_SCHEMA,
    is_non_splittable,
    load_jsonl,
    load_jsonl_shards,
    split_corrupt,
)

_GOOD = 120
_BAD = 4


def _lines() -> list[str]:
    rows = [
        f'{{"doc_id": {i}, "text": "doc {i} body", "lang": "en", "source": "web"}}'
        for i in range(_GOOD)
    ]
    rows += ['{"doc_id": 900, "text": "truncated', "not json at all",
             '{"doc_id": }',
             '{"doc_id": 901 "text": "missing comma"}']  # _BAD broken lines
    # (a line starting with '[' is the array-of-records path and can
    # yield ZERO rows rather than a quarantine row — deliberately not
    # used here; the quarantine contract is per *object* line)
    return rows


def _write_plain(d, name="corpus.jsonl"):
    p = d / name
    p.write_text("\n".join(_lines()) + "\n")
    return str(p)


def _write_gz(d, name="corpus.jsonl.gz"):
    p = d / name
    with gzip.open(p, "wt") as fh:
        fh.write("\n".join(_lines()) + "\n")
    return str(p)


def test_is_non_splittable_extension_sniff():
    assert is_non_splittable("a/b/shard-0001.jsonl.gz")
    assert is_non_splittable("s.JSONL.GZ")
    assert is_non_splittable("x.zst") and is_non_splittable("x.lz4")
    assert not is_non_splittable("a/b/shard-0001.jsonl")
    assert not is_non_splittable("x.bz2")  # bzip2 IS splittable


def test_gz_parity_with_uncompressed(spark, tmp_path):
    plain = load_jsonl(spark, _write_plain(tmp_path), DOCUMENTS_JSONL_SCHEMA)
    gz = load_jsonl(spark, _write_gz(tmp_path), DOCUMENTS_JSONL_SCHEMA)
    cols = [c for c in plain.columns]
    assert gz.columns == cols
    p_rows = sorted(map(str, plain.collect()))
    g_rows = sorted(map(str, gz.collect()))
    assert p_rows == g_rows  # byte-identical parse, quarantine included

    clean, dead, parsed = split_corrupt(gz)
    try:
        assert clean.count() == _GOOD
        assert dead.count() == _BAD
        raws = {r.raw_line for r in dead.collect()}
        assert "not json at all" in raws
    finally:
        parsed.unpersist()


def test_gz_single_shard_is_one_task(spark, tmp_path):
    """The non-splittability fact itself: one gz file -> one partition,
    regardless of line count."""
    path = _write_gz(tmp_path)
    df = load_jsonl_shards(
        spark, path, DOCUMENTS_JSONL_SCHEMA, rebalance=False
    )
    assert df.rdd.getNumPartitions() == 1
    # the uncompressed twin of the same content is NOT pinned to 1 —
    # it follows maxPartitionBytes and may split


def test_gz_rebalance_restores_parallelism(spark, tmp_path):
    path = _write_gz(tmp_path)
    df = load_jsonl_shards(spark, path, DOCUMENTS_JSONL_SCHEMA)
    assert (
        df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )
    # rebalance must not change the data, only its placement
    assert df.count() == _GOOD + _BAD
    clean, dead, parsed = split_corrupt(df)
    try:
        assert clean.count() == _GOOD and dead.count() == _BAD
    finally:
        parsed.unpersist()


def test_mixed_directory_plain_plus_gz(spark, tmp_path):
    """A directory holding both compressed and plain shards reads as one
    corpus; the rebalance triggers because SOME inputs are stuck."""
    _write_plain(tmp_path, "a.jsonl")
    _write_gz(tmp_path, "b.jsonl.gz")
    df = load_jsonl_shards(spark, str(tmp_path), DOCUMENTS_JSONL_SCHEMA)
    assert df.count() == 2 * (_GOOD + _BAD)
    clean, dead, parsed = split_corrupt(df)
    try:
        assert clean.count() == 2 * _GOOD
        assert dead.count() == 2 * _BAD
        # doc ids survive identically from both shards
        ids = [r.doc_id for r in clean.select("doc_id").collect()]
        assert sorted(ids) == sorted(list(range(_GOOD)) * 2)
    finally:
        parsed.unpersist()


def test_rebalance_skips_when_already_parallel(spark, tmp_path):
    """Many small gz shards already carry file-count parallelism — the
    explicit shuffle must NOT fire then (the write-side policy: shard
    small, compressed, many)."""
    n = spark.sparkContext.defaultParallelism
    for i in range(n):
        _write_gz(tmp_path, f"shard-{i:04d}.jsonl.gz")
    df = load_jsonl_shards(spark, str(tmp_path), DOCUMENTS_JSONL_SCHEMA)
    assert df.rdd.getNumPartitions() >= n
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# Codecs Spark cannot scan natively: .jsonl.zst via the Arrow-decompress
# path (load_jsonl_compressed). Contract parity with the native reader is
# the whole point — same quarantine semantics, split_corrupt composes.
# ---------------------------------------------------------------------------
import pyarrow as pa  # noqa: E402

from real_time_flight_data_pipeline_spark.sources.jsonl import (  # noqa: E402
    load_jsonl_compressed,
)


def _write_zst(d, name="corpus.jsonl.zst", codec="zstd"):
    p = d / name
    with pa.CompressedOutputStream(str(p), codec) as fh:
        fh.write(("\n".join(_lines()) + "\n").encode())
    return str(p)


def test_zst_parity_with_native_reader(spark, tmp_path):
    """Spark itself cannot read this file; the Arrow path must produce
    EXACTLY what the native reader produces for the same content."""
    plain = load_jsonl(spark, _write_plain(tmp_path), DOCUMENTS_JSONL_SCHEMA)
    zst = load_jsonl_compressed(
        spark, _write_zst(tmp_path), DOCUMENTS_JSONL_SCHEMA
    )
    assert zst.columns == plain.columns
    assert sorted(map(str, zst.collect())) == sorted(map(str, plain.collect()))


def test_zst_split_corrupt_composes(spark, tmp_path):
    df = load_jsonl_compressed(
        spark, _write_zst(tmp_path), DOCUMENTS_JSONL_SCHEMA
    )
    clean, dead, parsed = split_corrupt(df)
    try:
        assert clean.count() == _GOOD
        assert dead.count() == _BAD
        assert {r.raw_line for r in dead.collect()} >= {"not json at all"}
    finally:
        parsed.unpersist()


def test_zst_rebalance_fans_out_before_parse(spark, tmp_path):
    df = load_jsonl_compressed(
        spark, _write_zst(tmp_path), DOCUMENTS_JSONL_SCHEMA
    )
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    df_stuck = load_jsonl_compressed(
        spark, _write_zst(tmp_path), DOCUMENTS_JSONL_SCHEMA, rebalance=False
    )
    assert df_stuck.rdd.getNumPartitions() == 1
    assert sorted(map(str, df.collect())) == sorted(map(str, df_stuck.collect()))


def test_lz4_codec_variant(spark, tmp_path):
    """The codec parameter is not zstd-lore: the same path reads an lz4
    frame stream."""
    path = _write_zst(tmp_path, name="corpus.jsonl.lz4", codec="lz4")
    df = load_jsonl_compressed(
        spark, path, DOCUMENTS_JSONL_SCHEMA, codec="lz4"
    )
    assert df.count() == _GOOD + _BAD


def test_gz_rebalanced_parity_with_native_reader(spark, tmp_path):
    """The parse-after-rebalance replan (text scan + from_json) must be
    row-for-row identical to the native reader on the same gz bytes,
    quarantine column included."""
    path = _write_gz(tmp_path)
    native = load_jsonl(spark, path, DOCUMENTS_JSONL_SCHEMA)
    replanned = load_jsonl_shards(spark, path, DOCUMENTS_JSONL_SCHEMA)
    assert replanned.columns == native.columns
    assert sorted(map(str, replanned.collect())) == sorted(
        map(str, native.collect())
    )


def test_gz_replan_skips_blank_lines_like_native(spark, tmp_path):
    """The native JSON reader silently skips whitespace-only lines; the
    text-scan replan must too, or blanks surface as phantom all-NULL
    rows that split_corrupt would classify as CLEAN (quarantine col is
    null). Caught by probing; pinned here."""
    p = tmp_path / "blanks.jsonl.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(
            '{"doc_id": 1, "text": "a", "lang": "en", "source": "s"}\n'
            "\n   \n\t\n"
            '{"doc_id": 2, "text": "b", "lang": "en", "source": "s"}\n'
        )
    native = load_jsonl(spark, str(p), DOCUMENTS_JSONL_SCHEMA)
    replan = load_jsonl_shards(spark, str(p), DOCUMENTS_JSONL_SCHEMA)
    assert native.count() == 2
    assert sorted(map(str, replan.collect())) == sorted(
        map(str, native.collect())
    )
