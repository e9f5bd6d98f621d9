"""Measure the compressed-corpus ingest paths at real volume: plain vs
gzip (Spark-native, non-splittable) vs zstd (Arrow-decompress path Spark
cannot read natively), stuck-at-one-task vs rebalanced vs many-shards.

The number that matters at 100 TB is not the decompress itself — it is
what a non-splittable shard does to everything DOWNSTREAM. The measured
op is parse + whitespace-tokenize + aggregate (the cheapest realistic
curation stage); the contrast rows show the same bytes, the same op,
with parallelism stuck at one decompress task vs repaired by the
explicit rebalance vs carried by file-count (the write-side policy).

Corpus: sf0.1 documents replicated 200x with salted ids (~300 MB of
text, ~1M rows), built under /tmp once per run.

Run: python scripts/compressed_ingest_bench.py
Writes/merges compressed_ingest_results.json.
"""

from __future__ import annotations

import glob
import gzip
import json
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SF = "/root/testdata/sf0.1"
COPIES = 200
BASE = pathlib.Path("/tmp/flightframe_compressed_ingest")
OUT = pathlib.Path(__file__).with_name("compressed_ingest_results.json")


def build_corpus(spark) -> dict:
    """Replicate documents COPIES x into plain JSONL shards, then derive
    the compressed layouts from the same bytes: one .gz, one .zst, and
    32 .zst shards (driver-side streaming compress — the test env has no
    Hadoop zstd codec, which is the point of the Arrow read path)."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    shutil.rmtree(BASE, ignore_errors=True)
    (BASE / "zst32").mkdir(parents=True)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_base = docs.count()
    big = (
        docs.crossJoin(spark.range(COPIES).toDF("copy"))
        .select(
            (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), F.concat(F.lit("c"), F.col("copy"))).alias("text"),
            "lang",
            "source",
        )
    )
    t0 = time.perf_counter()
    (big.select(F.to_json(F.struct("doc_id", "text", "lang", "source")).alias("value"))
        .repartition(32).write.mode("overwrite").text(str(BASE / "plain")))
    build_plain = time.perf_counter() - t0

    parts = sorted(glob.glob(str(BASE / "plain" / "part-*")))
    t0 = time.perf_counter()
    with gzip.open(BASE / "corpus.jsonl.gz", "wb") as gz_out:
        for part in parts:
            with open(part, "rb") as fh:
                shutil.copyfileobj(fh, gz_out)
    with pa.CompressedOutputStream(str(BASE / "corpus.jsonl.zst"), "zstd") as z_out:
        for part in parts:
            z_out.write(open(part, "rb").read())
    for i, part in enumerate(parts):
        with pa.CompressedOutputStream(
            str(BASE / "zst32" / f"shard-{i:04d}.jsonl.zst"), "zstd"
        ) as z_out:
            z_out.write(open(part, "rb").read())
    build_compressed = time.perf_counter() - t0

    raw_mb = sum(pathlib.Path(p).stat().st_size for p in parts) / 1e6
    return {
        "n_rows": n_base * COPIES,
        "raw_jsonl_mb": round(raw_mb, 1),
        "gz_mb": round((BASE / "corpus.jsonl.gz").stat().st_size / 1e6, 1),
        "zst_mb": round((BASE / "corpus.jsonl.zst").stat().st_size / 1e6, 1),
        "build_plain_sec": round(build_plain, 1),
        "build_compressed_sec": round(build_compressed, 1),
    }


def _tokens_agg(df):
    """The downstream stage: parse already done, tokenize + aggregate."""
    from pyspark.sql import functions as F

    return df.select(
        F.count("*").alias("n"),
        F.sum(F.size(F.split(F.col("text"), r"\s+"))).alias("tok"),
    ).collect()[0]


def run_reads(spark, n_expect: int) -> dict:
    from real_time_flight_data_pipeline_spark.sources.jsonl import (
        DOCUMENTS_JSONL_SCHEMA,
        load_jsonl,
        load_jsonl_compressed,
        load_jsonl_shards,
    )

    out = {}

    def timed(key, df):
        t0 = time.perf_counter()
        agg = _tokens_agg(df)
        out[key] = {
            "wall_sec": round(time.perf_counter() - t0, 2),
            "rows": agg["n"],
        }
        assert agg["n"] == n_expect, (key, agg["n"], n_expect)
        return agg

    a = timed("plain_32shards", load_jsonl(
        spark, str(BASE / "plain"), DOCUMENTS_JSONL_SCHEMA))
    timed("gz_1shard_stuck", load_jsonl_shards(
        spark, str(BASE / "corpus.jsonl.gz"), DOCUMENTS_JSONL_SCHEMA,
        rebalance=False))
    timed("gz_1shard_rebalanced", load_jsonl_shards(
        spark, str(BASE / "corpus.jsonl.gz"), DOCUMENTS_JSONL_SCHEMA))
    timed("zst_1shard_stuck", load_jsonl_compressed(
        spark, str(BASE / "corpus.jsonl.zst"), DOCUMENTS_JSONL_SCHEMA,
        rebalance=False))
    b = timed("zst_1shard_rebalanced", load_jsonl_compressed(
        spark, str(BASE / "corpus.jsonl.zst"), DOCUMENTS_JSONL_SCHEMA))
    c = timed("zst_32shards", load_jsonl_compressed(
        spark, str(BASE / "zst32") + "/*.zst", DOCUMENTS_JSONL_SCHEMA))
    # same bytes -> same tokens, whichever path carried them
    assert a["tok"] == b["tok"] == c["tok"]
    return out


def main() -> None:
    from real_time_flight_data_pipeline_spark.session import get_spark

    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    spark = get_spark("compressed-ingest-bench")
    try:
        corpus = build_corpus(spark)
        reads = run_reads(spark, corpus["n_rows"])
    finally:
        spark.stop()
    shutil.rmtree(BASE, ignore_errors=True)
    results["sf0.1_x200"] = {"corpus": corpus, "reads": reads}
    OUT.write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
