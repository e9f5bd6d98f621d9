"""End-to-end: curation verdicts -> training-shard export -> validation.

The full platform path a training run takes: the curation stage sets
(quality -> near-dup keep-best -> decontamination) decide the kept set,
the kept documents export as hash-stable shards with a manifest, and the
manifest validates against what landed on disk. Pins the cross-module
contracts: the audit query's 'kept' verdict IS the funnel's final stage,
and the exported corpus is exactly the kept set — no silent drops
between deciding and shipping.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.operators.shards import (
    validate_manifest,
    write_sharded,
)
from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
import real_time_flight_data_pipeline_spark.plans  # noqa: F401
from real_time_flight_data_pipeline_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def test_curate_then_export_shards(spark, tmp_path):
    audit = REGISTRY["docs_curation_audit"].builder(spark, SF_SMOKE)
    kept_ids = audit.filter(F.col("verdict") == "kept").select("doc_id")
    funnel = {
        r.stage: r.n_docs
        for r in REGISTRY["docs_curation_funnel"].builder(spark, SF_SMOKE).collect()
    }
    n_kept = kept_ids.count()
    # the audit's kept set IS the funnel's final stage count
    assert n_kept == funnel["decontaminated"] > 0
    # verdict totals partition the corpus
    totals = {
        r.verdict: r.n
        for r in audit.groupBy("verdict").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sum(totals.values()) == funnel["total"]

    docs = load_table(spark, SF_SMOKE, "documents")
    kept_docs = docs.join(kept_ids, "doc_id", "left_semi")
    out = str(tmp_path / "train_shards")
    manifest = write_sharded(kept_docs, "doc_id", 4, out)
    assert sum(r.n_rows for r in manifest.collect()) == n_kept

    v = validate_manifest(spark, out, "doc_id")
    assert all(r.ok for r in v.collect())

    # what shipped is exactly the kept set — no silent drops on export
    shipped = spark.read.parquet(out)
    assert sorted(r.doc_id for r in shipped.select("doc_id").collect()) == sorted(
        r.doc_id for r in kept_ids.collect()
    )
