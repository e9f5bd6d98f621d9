"""Measure build-once vs probe-many for the persisted IVF-PQ index.

The catalog query embedding_ivfpq_topk pays training on every execution
(so the oracle can verify it); the deployed shape separates the two. This
records both sides at sf0.1: one build (train + encode + cell layout) and
the median of repeated probes against the persisted layout — the number
that shows probe latency is decoupled from training cost (r9 verdict #4).

Run: python scripts/ivfpq_index_bench.py              (sf0.1)
     python scripts/ivfpq_index_bench.py --100x       (the 100x corpus —
         probe latency must stay decoupled as the corpus grows, since a
         probe reads nprobe/K partitions + two codebooks, not the corpus)
Writes/merges ivfpq_index_results.json keyed by tier.
"""

from __future__ import annotations

import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.operators.ann_index import (
    build_ivfpq_index,
    probe_ivfpq_index,
)
from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
from real_time_flight_data_pipeline_spark.session import get_spark
from real_time_flight_data_pipeline_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.1"
SF_100X = "/tmp/flightframe_scale/sf100x"
INDEX = "/tmp/flightframe_ivfpq_index"
N_PROBES = 5
OUT = pathlib.Path(__file__).with_name("ivfpq_index_results.json")


def main() -> None:
    tier100 = "--100x" in sys.argv[1:]
    sf_dir, tier = (SF_100X, "sf100x") if tier100 else (SF, "sf0.1")
    spark = get_spark(app_name="flightframe-ivfpq-index-bench")
    if tier100 and not pathlib.Path(f"{sf_dir}/embeddings.parquet").exists():
        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
        from scale_curve import build_corpus_100x  # noqa: PLC0415

        build_corpus_100x(spark)
    qvec = list(
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("x"))
        .head()
        .x
    )
    # Warmup: classloading/codegen on the catalog twin.
    REGISTRY["embedding_ivfpq_topk"].builder(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    t0 = time.perf_counter()
    build_ivfpq_index(spark, sf_dir, INDEX)
    build_sec = round(time.perf_counter() - t0, 3)

    probes = []
    for _ in range(N_PROBES):
        t0 = time.perf_counter()
        probe_ivfpq_index(spark, INDEX, qvec).write.format("noop").mode(
            "overwrite"
        ).save()
        probes.append(round(time.perf_counter() - t0, 3))

    t0 = time.perf_counter()
    REGISTRY["embedding_ivfpq_topk"].builder(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    inquery_sec = round(time.perf_counter() - t0, 3)

    result = {
        "tier": tier,
        "build_sec": build_sec,
        "probe_median_sec": round(statistics.median(probes), 3),
        "probe_runs": probes,
        "catalog_inquery_sec": inquery_sec,
        "note": "probe pays no training: compare probe_median_sec to "
        "catalog_inquery_sec (train+probe fused) and build_sec "
        "(one-time).",
    }
    merged = json.loads(OUT.read_text()) if OUT.exists() else {}
    if "tier" not in merged and merged:  # legacy flat layout
        merged = {"sf0.1": merged}
    merged[tier] = result
    OUT.write_text(json.dumps(merged, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
