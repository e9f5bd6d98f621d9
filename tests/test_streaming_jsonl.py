"""Streaming JSONL ingest with the quarantine policy.

The batch JSONL source (sources/jsonl.py) under readStream: a spool
directory receives JSONL shards over time; each micro-batch splits
clean rows from quarantined lines in foreachBatch, appending both to
their tables. Pins that (a) the file streaming source respects the
explicit schema + corrupt-record column, (b) late-arriving shards flow
as new micro-batches, and (c) totals reconcile exactly with the batch
read of the same spool — nothing lost, nothing double-counted,
malformed lines observable (T6), never fatal.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.sources.jsonl import (
    CORRUPT_COL,
    DOCUMENTS_JSONL_SCHEMA,
    load_jsonl,
)


def _shard(path, lo, hi, bad_every=None):
    lines = []
    for i in range(lo, hi):
        if bad_every and i % bad_every == 0:
            lines.append(f'{{"doc_id": {i}, "text": "broken')
        else:
            lines.append(
                json.dumps(
                    {"doc_id": i, "text": f"doc {i}", "lang": "en", "source": "s"}
                )
            )
    path.write_text("\n".join(lines) + "\n")


def test_streaming_jsonl_quarantine_reconciles_with_batch(spark, tmp_path):
    spool = tmp_path / "spool"
    spool.mkdir()
    clean_out = str(tmp_path / "clean")
    dead_out = str(tmp_path / "dead")
    ckpt = str(tmp_path / "ckpt")

    _shard(spool / "a.jsonl", 0, 40, bad_every=7)

    def sink(batch_df, epoch_id):
        clean = batch_df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        dead = batch_df.filter(F.col(CORRUPT_COL).isNotNull()).select(
            F.col(CORRUPT_COL).alias("raw_line")
        )
        clean.write.mode("append").parquet(clean_out)
        dead.write.mode("append").parquet(dead_out)

    def run_once():
        q = (
            spark.readStream.schema(DOCUMENTS_JSONL_SCHEMA)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(str(spool))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # a late shard arrives; the checkpoint resumes, only the new file flows
    _shard(spool / "b.jsonl", 40, 70, bad_every=11)
    run_once()

    got_clean = spark.read.parquet(clean_out)
    got_dead = spark.read.parquet(dead_out)

    # cache barrier: the corrupt-column contract (see sources/jsonl.py)
    want = load_jsonl(spark, str(spool), DOCUMENTS_JSONL_SCHEMA).cache()
    want_clean = want.filter(F.col(CORRUPT_COL).isNull())
    want_dead = want.filter(F.col(CORRUPT_COL).isNotNull())

    assert got_clean.count() == want_clean.count() > 0
    assert got_dead.count() == want_dead.count() > 0
    assert sorted(r.doc_id for r in got_clean.collect()) == sorted(
        r.doc_id for r in want_clean.collect()
    )
    # doc 0 and 7k-multiples from shard a were malformed; none leaked
    clean_ids = {r.doc_id for r in got_clean.collect()}
    assert 7 not in clean_ids and 14 not in clean_ids
