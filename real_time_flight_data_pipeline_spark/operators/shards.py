"""Deterministic training-shard writer.

The last step of a curation pipeline: materialize the kept corpus as N
shards whose membership is a PURE FUNCTION of the document key — so a
re-run after adding documents only rewrites the shards whose content
changed, downstream trainers can address shards independently, and two
pipelines (or a pipeline and its audit) agree on placement without
coordination. ``repartition(n)`` round-robins and is NOT stable across
runs/cluster sizes; hash-of-key modulo is.

Writes ``shard=K/`` partition directories plus a ``_MANIFEST`` parquet of
per-shard (row count, key fingerprint, content fingerprint) — the handoff
contract a training job validates before reading. The key fingerprint is
the mergeable XOR of md5-derived key hashes (same construction as the
orders_partition_fingerprint catalog query); the content fingerprint is
the multiplicity-sensitive SUM of bounded md5 hashes over EVERY column
(canonical sorted-name struct -> JSON), so an in-place update to a
non-key column — including of duplicated rows, which XOR would cancel —
is detected and its shard rewritten (r7 review fixes: a key-only
fingerprint silently skipped content-changed shards). Both are
order-free aggregates, so validation never re-sorts anything.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long

SHARD_COL = "shard"


def _pin_utc(spark) -> None:
    """Force the UTC session timezone both fingerprint sites depend on:
    the content fingerprint hashes to_json output, whose timestamp
    formatting follows spark.sql.session.timeZone — a validator session
    configured differently from the writer would flag false drift on
    every shard containing a timestamp column (ADVICE r7). session.py
    pins UTC for the engine's own sessions; write_sharded and
    validate_manifest are also consumer-side entry points, so they pin
    it themselves (same pattern as sources/parquet.load_table)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def assign_shard(key: F.Column, n_shards: int) -> F.Column:
    """Stable shard id in [0, n_shards): md5-derived hash of the key,
    modulo shard count. md5 (not xxhash64/hash) so the assignment is
    reproducible across engines and Spark versions — shard layout is a
    CONTRACT, not an implementation detail."""
    return (md5_long(key.cast("string")) % n_shards).cast("int")


_CONTENT_HASH_BOUND = 2**31


def _content_fingerprint(cols: list[str]) -> F.Column:
    """Order-free SUM of bounded per-row content hashes over a CANONICAL
    (sorted-name) struct of every data column — the same expression is
    computable from the input frame and from the parquet read back off
    disk, so the manifest value doubles as a drift check. SUM, not XOR
    (r7 review): XOR cancels rows whose hash appears an even number of
    times, so editing a pair of identical rows was invisible; a sum
    counts multiplicity. Each term is bounded to 31 bits so the long sum
    cannot overflow below ~2^32 rows per shard (no ANSI/wrap semantics
    in play). (to_json keeps the hash engine-readable; values round-trip
    parquet binary-identically within a session.)"""
    row_hash = md5_long(
        F.to_json(F.struct(*[F.col(c) for c in sorted(cols)]))
    )
    return F.sum(row_hash % _CONTENT_HASH_BOUND)


def _delete_shard_dir(spark, path: str, shard: int) -> None:
    """Remove one shard=K partition directory via the Hadoop FS API (works
    for any supported filesystem, not just local disk)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(os.path.join(path, f"{SHARD_COL}={shard}"))
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(p, True)


def write_sharded(
    df: DataFrame, key: str, n_shards: int, path: str
) -> DataFrame:
    """Write ``df`` as shard-partitioned parquet plus a manifest; returns
    the manifest read BACK from disk (so the caller's next action reads
    a tiny parquet, not the export pipeline a third time). The barrier
    on the sharded frame means the upstream pipeline runs once: the
    manifest aggregate materializes it, the data write reuses the rows.

    Incremental re-runs rewrite ONLY the shards whose CONTENT changed
    (r7): the new manifest is computed first, diffed against the on-disk
    ``_MANIFEST`` per shard on (row count, key XOR fingerprint, all-
    column content XOR fingerprint — O(n_shards) driver rows, n_shards
    is small by construction), and the data write uses dynamic partition
    overwrite restricted to the changed shard ids. Shards that lost
    their last row are deleted explicitly (dynamic overwrite only
    touches partitions present in the written data). Unchanged shards
    keep their files byte-for-byte, so downstream trainers' shard-level
    caches stay valid across re-runs. The FIRST write (no manifest on
    disk) is a static overwrite so any stale partial-write debris under
    the path is cleared rather than surviving invisibly."""
    spark = df.sparkSession
    _pin_utc(spark)
    # Exclude a pre-existing column named like SHARD_COL: withColumn
    # replaces it with the computed id, and validate_manifest's
    # read-back recompute excludes it too — both sides must hash the
    # same column set (r7 review).
    data_cols = [c for c in df.columns if c != SHARD_COL]
    sharded = df.withColumn(
        SHARD_COL, assign_shard(F.col(key), n_shards)
    ).localCheckpoint(eager=False)
    manifest = (
        sharded.groupBy(SHARD_COL)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(md5_long(F.col(key).cast("string"))).alias(
                "key_fingerprint"
            ),
            _content_fingerprint(data_cols).alias("content_fingerprint"),
        )
        .orderBy(SHARD_COL)
    )
    mpath = os.path.join(path, "_MANIFEST")
    try:
        prior = {
            r[SHARD_COL]: (
                r["n_rows"],
                r["key_fingerprint"],
                # .get(): manifests written before the content column
                # compare unequal -> their shards rewrite once (upgrade).
                r.asDict().get("content_fingerprint"),
            )
            for r in spark.read.parquet(mpath).collect()
        }
    except AnalysisException as exc:
        # ONLY path-not-found means "first write" (static overwrite below
        # clears any stale debris). Any other manifest read failure —
        # corrupted parquet, permission/transient FS error — re-raises:
        # silently treating it as a first write would mask the corruption
        # signal and quietly downgrade the incremental guarantee to a
        # full static rewrite (ADVICE r7).
        if exc.getCondition() != "PATH_NOT_FOUND":
            raise
        prior = None

    new = {
        r[SHARD_COL]: (
            r["n_rows"],
            r["key_fingerprint"],
            r["content_fingerprint"],
        )
        for r in manifest.collect()
    }
    def _write(frame: DataFrame, mode: str) -> None:
        (
            frame.repartition(n_shards, F.col(SHARD_COL))
            .write.mode("overwrite")
            # explicit per-write mode: a session-level dynamic default
            # must not void the first-write clears-stale-dirs guarantee
            # (r7 review)
            .option("partitionOverwriteMode", mode)
            .partitionBy(SHARD_COL)
            .parquet(path)
        )

    if prior is None:
        # Static overwrite: clears stale shard dirs from a crashed run
        # that never reached its manifest write.
        _write(sharded, "static")
    else:
        changed = sorted(k for k in new if prior.get(k) != new[k])
        for gone in sorted(set(prior) - set(new)):
            _delete_shard_dir(spark, path, gone)
        if changed:
            _write(sharded.filter(F.col(SHARD_COL).isin(changed)), "dynamic")
        # no changed shards: data untouched, manifest still refreshed
    manifest.write.mode("overwrite").parquet(mpath)
    return spark.read.parquet(mpath).orderBy(SHARD_COL)


def validate_manifest(spark, path: str, key: str) -> DataFrame:
    """Recompute per-shard counts/fingerprints from the written shards
    and join against the manifest; ``ok`` is False for any shard that
    drifted (partial write, manual edit, replication fault) and for
    manifest rows with no data (lost shard) or data with no manifest row
    (orphan shard). Content drift in ANY column fails the shard, not
    just key-set drift."""
    _pin_utc(spark)
    data = spark.read.parquet(path)
    manifest = spark.read.parquet(os.path.join(path, "_MANIFEST"))
    data_cols = [c for c in data.columns if c != SHARD_COL]
    recomputed = data.groupBy(SHARD_COL).agg(
        F.count(F.lit(1)).alias("n_rows_actual"),
        F.bit_xor(md5_long(F.col(key).cast("string"))).alias(
            "key_fingerprint_actual"
        ),
        _content_fingerprint(data_cols).alias("content_fingerprint_actual"),
    )
    j = manifest.join(recomputed, SHARD_COL, "full_outer")
    ok = (
        F.col("n_rows").isNotNull()
        & F.col("n_rows_actual").isNotNull()
        & (F.col("n_rows") == F.col("n_rows_actual"))
        & (F.col("key_fingerprint") == F.col("key_fingerprint_actual"))
    )
    # Manifests written before the content column validate on the
    # key-level contract only (the next write_sharded run upgrades them)
    # — the consumer-side validator must not crash on a legacy corpus
    # (r7 review).
    if "content_fingerprint" in manifest.columns:
        ok = ok & (
            F.col("content_fingerprint") == F.col("content_fingerprint_actual")
        )
    return j.select(SHARD_COL, "n_rows", "n_rows_actual", ok.alias("ok"))
