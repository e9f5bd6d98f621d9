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
    """Accepted-document store with exact-dedup ingest.

    ``accept`` (optional) is a quality gate: a function of the batch
    DataFrame returning a boolean Column; rows where it is false are
    rejected BEFORE dedup, so a rejected document never claims a
    fingerprint (a later better-quality duplicate can still land). This
    is where the catalog's column-expression quality passes (classifier
    score, language / repetition filters) plug into ingest — the gate
    runs inside the same scan, no extra job.

    ``prefilter`` (optional) is the JOIN-shaped gate: a DataFrame ->
    DataFrame transform applied before ``accept``, for passes that need
    more than a per-row expression — benchmark decontamination (semi/anti
    join against a broadcast gram set), allow/deny-list joins. It must
    only FILTER (never rewrite doc_id/text), since dedup fingerprints the
    text it returns."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        keep_versions: int = 2,
        accept=None,
        prefilter=None,
    ):
        self.spark = spark
        self.accept = accept
        self.prefilter = prefilter
        self.table = ParquetTable(spark, root, CORPUS_SCHEMA, keep_versions)

    def read(self) -> DataFrame:
        return self.table.read()

    def _gated(self, batch: DataFrame) -> DataFrame:
        if self.prefilter is not None:
            batch = self.prefilter(batch)
        return batch.filter(self.accept(batch)) if self.accept else batch

    def ingest_batch(self, batch: DataFrame) -> None:
        """Dedup ``batch`` within itself and against history, then commit.

        Representative choice is deterministic (lowest doc_id per
        fingerprint), so replays and retries converge to the same table
        contents — the exactly-once-via-idempotence contract the flight
        pipeline's fact merge uses (T3), applied to corpus curation."""
        fp = self._gated(batch).select(
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
    """Drain a file-replay document stream through the dedup ingest.

    Driver shape shared with the vector-index maintainer via
    ``streaming.replay``; see that module for why the dedup/commit tiers
    below the driver stay separate (pointer-flip overwrite on a text
    fingerprint here vs cell-partitioned append under id+quantization
    keys there)."""
    from .replay import run_file_replay  # noqa: PLC0415

    run_file_replay(spark, source_dir, schema, store.ingest_batch, checkpoint_dir)


# ---------------------------------------------------------------------------
# Near-dup screening tier: MinHash-LSH against the accepted-corpus history.
# Same parameters as the batch detector (plans/northstar.near_dup_pairs_from:
# 3-token shingles, 8 minhashes, 4 bands x 2 rows, Jaccard >= 0.5) so the
# accepted-corpus invariant — no two accepted documents are near-dups — is
# checkable by running that exact batch detector over the store.
# ---------------------------------------------------------------------------
_N_MINHASH = 8
_SHINGLE_K = 3
_JACCARD_THRESHOLD = 0.5

BANDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band_idx", T.IntegerType()),
        T.StructField("band_key", T.StringType()),
    ]
)


def _shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, sh): distinct 3-token shingles, behind a barrier (the set
    feeds hashing AND the verify join — same CollapseProject guard as the
    batch detector)."""
    from ..functions import text as TX

    # Tokenize behind its own barrier first: shingles() references the
    # token array 3x per gram, so an inline tokens(text) re-runs the
    # split per reference (the same CollapseProject trap the batch
    # detector guards; measured 2.3x on the minhash stage, r12).
    toks = docs.select(
        "doc_id", TX.tokens(F.col("text")).alias("toks")
    ).localCheckpoint(eager=False)
    return toks.select(
        "doc_id",
        F.array_distinct(TX.shingles(F.col("toks"), _SHINGLE_K)).alias("sh"),
    ).localCheckpoint(eager=False)


def _band_rows(shin: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_key) LSH band table from shingle sets."""
    from ..functions import text as TX

    hsh = shin.select(
        "doc_id", TX.shingle_base_hashes(F.col("sh")).alias("hs")
    ).localCheckpoint(eager=False)
    mh = hsh.select(
        "doc_id",
        *[
            TX.minhash_from_hashes(F.col("hs"), s).alias(f"mh{s}")
            for s in range(_N_MINHASH)
        ],
    )
    return mh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat(
                                F.col(f"mh{2*b}").cast("string"),
                                F.lit("_"),
                                F.col(f"mh{2*b+1}").cast("string"),
                            )
                        ).alias("band_key"),
                    )
                    for b in range(_N_MINHASH // 2)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_key")


def _verify_pairs(cand: DataFrame, sa: DataFrame, sb: DataFrame) -> DataFrame:
    """Exact-Jaccard verify of (a_id, b_id) candidates against shingle sets
    sa(a_id, a_sh) / sb(b_id, b_sh); returns pairs at or above threshold."""
    verified = (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("a_sh", "b_sh")).alias("inter"),
            F.size("a_sh").alias("na"),
            F.size("b_sh").alias("nb"),
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return verified.filter(jac >= _JACCARD_THRESHOLD)


class NearDupCorpusStore(CorpusStore):
    """CorpusStore that additionally rejects NEAR-duplicates of history.

    Alongside the corpus table it maintains the accepted documents' LSH
    band table, so screening an arriving batch is a band-key equi join
    against history (shuffle O(colliding candidates), never
    O(batch x history)) followed by exact-Jaccard verification of the
    candidates only — the incremental form of the batch MinHash-LSH plan.
    Invariant: no two accepted documents are near-dups at the batch
    detector's own threshold; first arrival wins."""

    def __init__(self, spark: SparkSession, root: str, keep_versions: int = 2):
        super().__init__(spark, f"{root}/docs", keep_versions)
        self.bands = ParquetTable(
            spark, f"{root}/bands", BANDS_SCHEMA, keep_versions
        )

    def ingest_batch(self, batch: DataFrame) -> None:
        fp = self._gated(batch).select(
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
                    F.struct("doc_id", "text", "lang", "source"),
                    F.col("doc_id"),
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
        exact_ok = in_batch.join(
            history.select("fingerprint"), "fingerprint", "left_anti"
        ).localCheckpoint(eager=True)
        # ^ eager: three consumers below (shingles, band build, final
        # commit) must see ONE consistent batch slice.

        shin = _shingle_sets(exact_ok)
        bands = _band_rows(shin).localCheckpoint(eager=True)

        # In-batch near-dups: keep the lowest doc_id of any verified pair.
        a, b = bands.alias("a"), bands.alias("b")
        cand_in = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
            )
            .dropDuplicates()
        )
        sa = shin.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"))
        sb = shin.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"))
        drop_in = (
            _verify_pairs(cand_in, sa, sb).select(F.col("b_id").alias("doc_id")).distinct()
        )

        # vs-history near-dups: batch doc drops if it verifies against ANY
        # accepted doc. History shingles are recomputed only for the
        # candidate slice (join on candidate doc_ids), never the full store.
        hist_bands = self.bands.read()
        cand_hist = (
            bands.join(
                hist_bands.withColumnRenamed("doc_id", "h_id"),
                ["band_idx", "band_key"],
            )
            .select(F.col("doc_id").alias("a_id"), F.col("h_id").alias("b_id"))
            .dropDuplicates()
            .localCheckpoint(eager=True)
        )
        hist_slice = history.join(
            cand_hist.select(F.col("b_id").alias("doc_id")).distinct(),
            "doc_id",
            "semi",
        )
        hb = _shingle_sets(hist_slice).select(
            F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh")
        )
        drop_hist = (
            _verify_pairs(cand_hist, sa, hb).select(F.col("a_id").alias("doc_id")).distinct()
        )

        dropped = drop_in.unionByName(drop_hist).distinct()
        survivors = exact_ok.join(dropped, "doc_id", "left_anti").localCheckpoint(
            eager=True
        )
        self.table.overwrite(
            history.unionByName(
                survivors.select([f.name for f in CORPUS_SCHEMA.fields])
            )
        )
        self.bands.overwrite(
            self.bands.read().unionByName(
                bands.join(survivors.select("doc_id"), "doc_id", "semi")
            )
        )
