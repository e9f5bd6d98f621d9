"""Streaming maintenance of the persisted IVF-PQ index (r10).

Completes the index lifecycle: build once (operators/ann_index.
build_ivfpq_index), probe many (probe_ivfpq_index), and — here — ACCEPT A
STREAM of vector batches, deduplicating each against the index and itself
before appending, with replays idempotent by construction.

Dedup identity is the PQ quantization itself: two vectors with the same
(cell, codes) are indistinguishable to every probe, so admitting both
only inflates the index — the arrival-side analog of SemDeDup at the
codebook's resolution. This needs NO raw-vector history (the index stores
codes, M small ints per vector, never embeddings), which is what makes
the check affordable on every micro-batch at 100 TB: it is a join of the
encoded batch against the codes table, keyed on the quantization.

Idempotency needs no ledger: the accept step anti-joins on vec_id against
the live index, so a replayed micro-batch (including one whose previous
attempt half-appended before a crash) re-adds only the rows that are
actually missing. Appends land inside existing cell partitions; orphan
part-files from a mid-write crash hold rows later replays skip by id.

Reference parity: the reference's loader upserts arrivals into warehouse
tables keyed on natural ids (SURVEY §2.7 M3 insert-ignore / §2.9 T3
exactly-once-by-idempotence); this is the same contract for the ANN tier.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.ann_index import encode_batch

VECTOR_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


@dataclass
class IngestStats:
    n_batch: int
    n_replayed: int      # vec_id already in the index (replay / re-send)
    n_quantized_dup: int  # PQ-identical to an indexed or in-batch vector
    n_added: int


class VectorIndexMaintainer:
    """foreachBatch sink over a persisted IVF-PQ index directory."""

    def __init__(self, spark: SparkSession, index_path: str) -> None:
        self.spark = spark
        self.path = index_path

    def _cells(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/cells")

    def ingest_batch(self, batch: DataFrame) -> IngestStats:
        n_batch = batch.count()
        if n_batch == 0:
            return IngestStats(0, 0, 0, 0)
        enc = encode_batch(self.spark, self.path, batch).localCheckpoint(
            eager=True  # eager: the accept joins and the append must see
            # ONE encoding; lazy would re-encode per action
        )
        existing = self._cells()
        # Replay guard: ids already present add nothing (idempotent-by-key,
        # the T3 contract — no ledger, so a half-appended crash replays
        # cleanly too).
        fresh = enc.join(existing.select("vec_id"), "vec_id", "anti")
        # Quantized dedup: the (cell, codes) key IS the index's resolution.
        qkey = F.concat_ws(
            "_", F.col("cell"), F.concat_ws(",", F.col("codes"))
        )
        indexed_keys = existing.select(qkey.alias("qk")).distinct()
        deduped = (
            fresh.withColumn("qk", qkey)
            .join(indexed_keys.hint("shuffle_hash"), "qk", "anti")
            # in-batch: keep the lowest vec_id per quantization key
            .withColumn(
                "_rep", F.min("vec_id").over(_qk_window())
            )
            .filter(F.col("vec_id") == F.col("_rep"))
            .drop("qk", "_rep")
        )
        added = deduped.localCheckpoint(eager=True)
        n_added = added.count()
        # Count fresh BEFORE the append: a re-listing of the cells path
        # after the write would see the just-added files and undercount.
        n_fresh = fresh.count()
        if n_added:
            added.write.mode("append").partitionBy("cell").parquet(
                f"{self.path}/cells"
            )
        return IngestStats(
            n_batch=n_batch,
            n_replayed=n_batch - n_fresh,
            n_quantized_dup=n_fresh - n_added,
            n_added=n_added,
        )


def _qk_window():
    from pyspark.sql import Window

    return Window.partitionBy("qk")


def run_file_replay_vectors(
    spark: SparkSession,
    source_dir: str,
    maintainer: VectorIndexMaintainer,
    checkpoint_dir: str,
) -> None:
    """Drain a file-replay vector stream through the index maintainer."""
    stream = (
        spark.readStream.schema(VECTOR_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        maintainer.ingest_batch(batch_df)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
