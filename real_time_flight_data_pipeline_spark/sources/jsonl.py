"""JSONL corpus source with an explicit corrupt-record policy.

Web-scale text corpora ship as JSONL shards; at 100 TB some lines are
always broken (truncated uploads, encoding damage, concatenated crawler
records). The reference's policy for malformed data is parse-to-NULL-
never-crash (flight_stream.py from_json semantics; SURVEY.md T6) — this
source applies the same discipline to file corpora and makes the failure
path OBSERVABLE instead of silent:

* schema is explicit (never inferred — inference at corpus scale costs a
  full pre-scan and drifts between runs);
* PERMISSIVE mode + ``columnNameOfCorruptRecord`` captures each broken
  line verbatim in a quarantine column;
* :func:`split_corrupt` separates clean rows from a dead-letter frame
  carrying the raw line, mirroring streaming/pipeline.dead_letter_split.

FAILFAST is the right mode for small trusted fixtures; for a crawl shard
it turns one bad byte into a dead job — quarantine-and-continue is the
scale policy, with the DLQ row count as the monitoring signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def load_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read JSONL with the quarantine column attached. ``schema`` must
    include ``CORRUPT_COL`` (string) — Spark populates it with the raw
    line for any record that fails to parse, and leaves it NULL for
    clean rows."""
    if CORRUPT_COL not in schema.fieldNames():
        raise ValueError(f"schema must include {CORRUPT_COL!r}")
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(clean rows without the quarantine column, dead-letter rows, and
    the cached parsed frame both derive from).

    A corrupt line arrives with every schema field NULL except the
    quarantine column; clean rows have it NULL. The dead-letter frame
    keeps the raw line plus an ingest timestamp, matching the streaming
    DLQ shape.

    The cache() barrier is REQUIRED, not an optimization: Spark forbids
    querying a raw JSON source through the corrupt column alone
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the column exists only during
    parsing), and the documented contract is to cache/materialize before
    filtering on it. It also means the file is parsed once for both
    branches.

    Lifecycle (r7, ADVICE r6): the cache belongs to the CALLER — after
    materializing both branches (writing clean rows, logging the DLQ),
    call ``parsed.unpersist()`` so a long-lived ingest session does not
    accumulate cached partitions, one parse per shard. The clean/dead
    frames stay valid after unpersist (they recompute from the source if
    re-used — re-parsing, which is exactly the trade the caller opts
    into by releasing the memory)."""
    parsed = df.cache()
    clean = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dead = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line"),
        F.current_timestamp().alias("quarantined_at"),
    )
    return clean, dead, parsed


# ---------------------------------------------------------------------------
# Compressed shards (r16). Web corpora ship gzipped (.jsonl.gz); Spark's
# JSON reader decompresses transparently — the load_jsonl path above works
# unchanged, quarantine column included. What does NOT carry over is the
# parallelism: gzip is a non-splittable codec, so each .gz shard becomes
# exactly ONE input task no matter its size or
# spark.sql.files.maxPartitionBytes. At 100 TB that is the difference
# between a healthy scan and 32 cores idling behind one 10 GB shard —
# so the compressed path is explicit about the hazard instead of
# inheriting it silently.
# ---------------------------------------------------------------------------
_NON_SPLITTABLE = (".gz", ".gzip", ".zst", ".zstd", ".snappy", ".lz4")


def is_non_splittable(path: str) -> bool:
    """True if the file extension names a codec Spark cannot split
    (one task per file; bzip2 is the splittable exception among the
    common stream codecs)."""
    return path.lower().endswith(_NON_SPLITTABLE)


def load_jsonl_shards(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    rebalance: bool = True,
) -> DataFrame:
    """Read a directory (or glob) of JSONL shards, compressed or not,
    with the same quarantine contract as :func:`load_jsonl`.

    When the input resolves to non-splittable compressed files and they
    number fewer than the session's parallelism, the scan is stuck at
    one task per shard; with ``rebalance=True`` (default) the read is
    REPLANNED as text-scan -> round-robin repartition -> ``from_json``,
    so the JSON parse itself — not just the stages after it — runs at
    ``defaultParallelism`` (only the codec's serial decompress stays on
    the scan task). The explicit shuffle moves raw lines once; measured
    at ~360 MB / 1M rows (compressed_ingest_results.json), parse-after-
    rebalance cut the single-gz-shard wall a further ~2x over
    rebalancing the already-parsed frame, and ~4x over staying stuck.
    ``from_json`` under PERMISSIVE + the quarantine column reproduces
    the native reader's contract exactly (pinned by the zst parity
    tests, which share this parse). Callers that only count rows can
    pass ``rebalance=False`` and skip the shuffle.

    The scale policy this encodes: WRITE corpora as many small-enough
    compressed shards (the write_sharded manifest path already does) so
    file-count parallelism replaces split parallelism; the rebalance is
    the read-side repair for corpora we did not write ourselves.
    """
    df = load_jsonl(spark, path, schema)
    if not rebalance:
        return df
    files = [f for f in df.inputFiles() if is_non_splittable(f)]
    if files and df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        lines = (
            spark.read.text(path)
            # the native JSON reader SKIPS whitespace-only lines; without
            # this filter they would surface as phantom all-NULL rows
            # that even pass the quarantine check (clean by col-is-null).
            # rlike, not trim: Spark's trim strips only spaces, not tabs
            .filter(F.col("value").rlike(r"\S"))
            .repartition(spark.sparkContext.defaultParallelism)
        )
        return lines.select(
            F.from_json(
                F.col("value"),
                schema,
                {"mode": "PERMISSIVE",
                 "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("r")
        ).select("r.*")
    return df


# ---------------------------------------------------------------------------
# Codecs Spark has NO native read for (r16): public text corpora
# overwhelmingly ship as .jsonl.zst, and a bare Spark install cannot scan
# them (no Hadoop zstd stream codec on the JSON reader path). pyarrow —
# already on every executor for Arrow exchange — decompresses
# zstd/lz4/brotli/snappy as framed streams, so the read becomes:
# binaryFile scan (one task per shard, inherently) -> Arrow-batched
# per-file CompressedInputStream decompress + line split -> from_json
# under the SAME PERMISSIVE/quarantine contract as load_jsonl (verified
# byte-identical semantics in tests). Memory bound: one decompressed
# shard per task — the write-side policy (many small shards) is the same
# one the gz path encodes, and the rebalance repair composes unchanged.
# ---------------------------------------------------------------------------
def _decompress_lines(codec: str):
    def gen(batches):
        import pandas as pd
        import pyarrow as pa

        for pdf in batches:
            for content in pdf["content"]:
                stream = pa.CompressedInputStream(
                    pa.BufferReader(content), codec
                )
                data = stream.read()  # NativeFile.read -> bytes
                text = bytes(data).decode("utf-8", errors="replace")
                lines = [ln for ln in text.split("\n") if ln.strip()]
                if lines:
                    yield pd.DataFrame({"line": lines})

    return gen


def load_jsonl_compressed(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    codec: str = "zstd",
    rebalance: bool = True,
) -> DataFrame:
    """Read JSONL shards in a codec Spark cannot scan natively (zstd by
    default; lz4/brotli/snappy too). Same quarantine contract as
    :func:`load_jsonl`: ``schema`` must carry ``CORRUPT_COL``, broken
    lines arrive with every field NULL except the raw line there, and
    :func:`split_corrupt` composes on the result unchanged (from_json
    has no QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction, but the cache
    barrier is still one-parse-for-both-branches).

    binaryFile yields one task per shard; with ``rebalance=True`` the
    line frame is round-robin repartitioned to session parallelism
    BEFORE the parse when shard count falls short, so both the JSON
    parse and everything downstream fan out (the decompress itself is
    irreducibly per-file).
    """
    if CORRUPT_COL not in schema.fieldNames():
        raise ValueError(f"schema must include {CORRUPT_COL!r}")
    raw = spark.read.format("binaryFile").load(path).select("content")
    lines = raw.mapInPandas(_decompress_lines(codec), schema="line string")
    n_shards = raw.rdd.getNumPartitions()
    if rebalance and n_shards < spark.sparkContext.defaultParallelism:
        lines = lines.repartition(spark.sparkContext.defaultParallelism)
    return lines.select(
        F.from_json(
            "line",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("r")
    ).select("r.*")
