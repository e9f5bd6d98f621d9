"""Streaming maintenance of the persisted IVF-PQ index (r10).

Completes the index lifecycle: build once (operators/ann_index.
build_ivfpq_index), probe many (probe_ivfpq_index), and — here — ACCEPT A
STREAM of vector batches, deduplicating each against the index and itself
before appending, with replays idempotent by construction.

Dedup identity is the PQ quantization itself: two vectors with the same
(cell, codes) are indistinguishable to every probe, so admitting both
only inflates the index — the arrival-side analog of SemDeDup at the
codebook's resolution. This needs NO raw-vector history (the index stores
codes, M small ints per vector, never embeddings).

What makes the check affordable on every micro-batch at 100 TB is CELL
PRUNING (r10 verdict #1): the encoded batch's cell set is known and small
(≤ min(|batch|, K)), and both dedup keys are cell-local — a replayed
vec_id re-encodes to the same cell (encoding with the persisted codebooks
is deterministic and ids are content-immutable, the T3 replay contract),
and a quantization key (cell, codes) can by construction only collide
inside its own cell. So the index side of both anti-joins is first
filtered to the batch's cells — a literal ``cell IN (...)`` that lands as
a static PartitionFilter (the same prune ``probe_ivfpq_index`` uses), and
per-batch cost is O(batch's cell partitions), not O(index). Pinned by a
scanned-file assertion in ``tests/test_streaming_vector_index.py``.

Idempotency needs no ledger: the accept step anti-joins on vec_id against
the live index, so a replayed micro-batch (including one whose previous
attempt half-appended before a crash) re-adds only the rows that are
actually missing. Appends land inside existing cell partitions; orphan
part-files from a mid-write crash hold rows later replays skip by id.
Appended small files are bounded by threshold compaction
(``operators.ann_index.compact_index_cells``), which the maintainer can
run opportunistically via ``maybe_compact``.

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
    n_batch: int          # distinct vec_ids in the micro-batch
    n_replayed: int      # vec_id already in the index (replay / re-send)
    n_quantized_dup: int  # PQ-identical to an indexed or in-batch vector
    n_added: int
    n_id_dup: int = 0     # extra same-id rows collapsed before encoding


class VectorIndexMaintainer:
    """foreachBatch sink over a persisted IVF-PQ index directory.

    ``strict_ids`` picks the replay guard's index projection (r11 ADVICE,
    medium): the default (False) prunes the vec_id anti-join to the
    batch's cell set, which is O(batch cells) per batch but sound ONLY
    under the content-immutability contract — a re-sent id must carry the
    same embedding, else it re-encodes into a different cell, escapes the
    pruned guard, and is appended as a duplicate id. The in-batch
    min(embedding) collapse defends WITHIN a batch; it cannot defend
    across batches. ``strict_ids=True`` runs the id guard against an
    UNPRUNED id projection instead — a column-pruned scan of just the
    vec_id column over all cells (O(index ids) per batch, ids are 8
    bytes/row) — which catches cross-batch contract violations at the
    cost the r10 pruning removed. Choose per deployment: trusted
    replay-only sources keep the default; sources that may mutate
    payloads under a reused id pay for strict."""

    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        strict_ids: bool = False,
    ) -> None:
        self.spark = spark
        self.path = index_path
        self.strict_ids = strict_ids

    def _cells(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/cells")

    def _pruned_existing(self, enc: DataFrame) -> tuple[DataFrame, list[int]]:
        """The index side of both accept anti-joins, PRUNED to the encoded
        batch's cell set (r10 verdict #1). The collect is bounded by
        min(|batch|, K coarse cells); the returned frame's scan carries a
        static ``cell IN (...)`` PartitionFilter, so per-batch dedup reads
        only the batch's cell partitions — O(batch cells), not O(index).
        Sound because both keys are cell-local: a replayed id lands in the
        same cell (deterministic encode, content-immutable ids) and a
        quantization key embeds its cell."""
        from ..operators.ann_index import await_stable_cells  # noqa: PLC0415

        batch_cells = [
            int(r.cell) for r in enc.select("cell").distinct().collect()
        ]
        # Same reader-side compaction guard as probes: never dedup against
        # a cell set with a mid-swap hole in it.
        await_stable_cells(self.spark, self.path, batch_cells)
        return (
            self._cells().filter(F.col("cell").isin(batch_cells)),
            batch_cells,
        )

    def ingest_batch(self, batch: DataFrame) -> IngestStats:
        n_rows = batch.count()
        if n_rows == 0:
            return IngestStats(0, 0, 0, 0)
        # A micro-batch may re-send the same vec_id more than once (at-least
        # -once sources); two same-id rows whose embeddings differ could
        # quantize differently and BOTH survive a quantization-key dedup,
        # permanently breaking the unique-vec_id invariant (ADVICE r10). So
        # collapse to one deterministic row per id FIRST — min(embedding)
        # (arrays order lexicographically), not dropDuplicates, so a retry
        # that sees a different row order picks the same representative.
        batch = batch.groupBy("vec_id").agg(
            F.min("embedding").alias("embedding")
        )
        n_batch = batch.count()  # distinct ids, counted from the collapsed
        # batch itself — NOT from the encoded frame, so an encode-side drop
        # can never be misreported as an id-dup (r11 ADVICE, low)
        enc = encode_batch(self.spark, self.path, batch).localCheckpoint(
            eager=True  # eager: the accept joins and the append must see
            # ONE encoding; lazy would re-encode per action
        )
        n_enc = enc.count()
        if n_enc != n_batch:
            # Encoding is total by construction (broadcast-cross assign +
            # inner joins on frames derived from the same input); a row
            # going missing means a malformed embedding slipped past the
            # source schema — fail loud, don't silently under-ingest.
            raise ValueError(
                f"encode_batch dropped {n_batch - n_enc} of {n_batch} "
                "rows; malformed embeddings in the micro-batch"
            )
        existing, _ = self._pruned_existing(enc)
        # Replay guard: ids already present add nothing (idempotent-by-key,
        # the T3 contract — no ledger, so a half-appended crash replays
        # cleanly too). Strict mode checks ids against the WHOLE index
        # (column-pruned to just vec_id), catching re-sent ids whose
        # mutated embedding re-encoded into a different cell.
        id_guard = (
            self._cells().select("vec_id")
            if self.strict_ids
            else existing.select("vec_id")
        )
        fresh = enc.join(id_guard, "vec_id", "anti")
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
            n_id_dup=n_rows - n_batch,
        )

    def maybe_compact(self, max_files_per_cell: int = 8) -> list[int]:
        """Threshold-triggered small-file compaction (r10 verdict #2):
        rewrite cells whose part-file count exceeds the bound so probe
        latency stays at its build-time figure as micro-batches accrete.
        Content-preserving and crash-safe (staged swap with fail-loud
        recovery) — see ``operators.ann_index.compact_index_cells``. Call
        between triggers, never concurrently with an in-flight append;
        concurrent probes from OTHER sessions are tolerated because every
        reader (probe_ivfpq_index, _pruned_existing) first runs
        ``await_stable_cells``, which waits out the swap window and fails
        loud on a crashed swap instead of silently dropping a cell."""
        from ..operators.ann_index import compact_index_cells  # noqa: PLC0415

        return compact_index_cells(
            self.spark, self.path, max_files_per_cell=max_files_per_cell
        )


def _qk_window():
    from pyspark.sql import Window

    return Window.partitionBy("qk")


def run_file_replay_vectors(
    spark: SparkSession,
    source_dir: str,
    maintainer: VectorIndexMaintainer,
    checkpoint_dir: str,
    compact_max_files: int | None = 8,
) -> None:
    """Drain a file-replay vector stream through the index maintainer.

    After each micro-batch's append the maintainer opportunistically
    compacts any cell whose part-file count exceeded
    ``compact_max_files`` (r11 verdict #1/#2 wiring): foreachBatch sinks
    run serially within the query, so the compaction never overlaps an
    in-flight append — the single-writer contract holds by construction.
    The threshold check itself is a driver-side listing of K cell dirs
    (K = coarse codebook size), so the common no-op case costs no Spark
    job. ``compact_max_files=None`` disables compaction.

    Driver shape shared with the corpus store via ``streaming.replay``;
    see that module for why the tiers below the driver stay separate."""
    from .replay import run_file_replay  # noqa: PLC0415

    def ingest(batch_df: DataFrame) -> None:
        maintainer.ingest_batch(batch_df)
        if compact_max_files is not None:
            maintainer.maybe_compact(max_files_per_cell=compact_max_files)

    run_file_replay(spark, source_dir, VECTOR_SCHEMA, ingest, checkpoint_dir)
