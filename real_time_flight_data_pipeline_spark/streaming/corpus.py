"""Incremental corpus curation: streaming document ingest with exact
dedup-against-history.

The batch catalog dedups a CLOSED corpus (plans/northstar.q_exact_dedup);
a training-data pipeline at 100 TB instead receives documents
continuously and must dedup each arriving batch against everything
already accepted. This module is that loop as a Structured Streaming
sink: fingerprint the batch (md5-prefix of the raw text — the same
cross-engine hash the batch queries use), pick one deterministic
representative per fingerprint IN the batch (lowest doc_id), anti-join
the accepted-corpus history, and commit survivors through the
versioned-parquet pointer flip (streaming/pipeline.ParquetTable), which
makes replayed micro-batches idempotent: a replayed document's
fingerprint is already in history, the anti join drops it, and the
commit rewrites identical contents.

Scale shape: the history side of the anti join is keyed on fingerprint
(shuffle on the hash, O(batch + matched-history partitions)); no
all-pairs anything; the per-batch in-batch dedup is one map-combined
aggregation. At real scale the accepted-fingerprint set would live as a
bucketed table co-located with the batch shuffle — the anti join's key
is already that layout's key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import md5_long
from .pipeline import ParquetTable

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("fingerprint", T.LongType()),
    ]
)


class CorpusStore:
    """Accepted-document store with exact-dedup ingest."""

    def __init__(self, spark: SparkSession, root: str, keep_versions: int = 2):
        self.spark = spark
        self.table = ParquetTable(spark, root, CORPUS_SCHEMA, keep_versions)

    def read(self) -> DataFrame:
        return self.table.read()

    def ingest_batch(self, batch: DataFrame) -> None:
        """Dedup ``batch`` within itself and against history, then commit.

        Representative choice is deterministic (lowest doc_id per
        fingerprint), so replays and retries converge to the same table
        contents — the exactly-once-via-idempotence contract the flight
        pipeline's fact merge uses (T3), applied to corpus curation."""
        fp = batch.select(
            "doc_id",
            "text",
            "lang",
            "source",
            md5_long(F.col("text")).alias("fingerprint"),
        )
        in_batch = (
            fp.groupBy("fingerprint")
            .agg(
                F.min_by(
                    F.struct("doc_id", "text", "lang", "source"), F.col("doc_id")
                ).alias("r")
            )
            .select(
                F.col("r.doc_id").alias("doc_id"),
                F.col("r.text").alias("text"),
                F.col("r.lang").alias("lang"),
                F.col("r.source").alias("source"),
                "fingerprint",
            )
        )
        history = self.table.read()
        survivors = in_batch.join(
            history.select("fingerprint"), "fingerprint", "left_anti"
        )
        merged = history.unionByName(
            survivors.select([f.name for f in CORPUS_SCHEMA.fields])
        )
        self.table.overwrite(merged)


def run_file_replay_corpus(
    spark: SparkSession,
    source_dir: str,
    store: CorpusStore,
    checkpoint_dir: str,
    schema: T.StructType,
) -> None:
    """Drain a file-replay document stream through the dedup ingest."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.ingest_batch(batch_df)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
