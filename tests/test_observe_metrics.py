"""Observation API: in-flight metrics without a second scan.

Production pipelines need row counts / null rates / value bounds OF THE
DATA THAT ACTUALLY FLOWED, and running separate audit queries doubles the
scan bill. `df.observe(Observation, ...)` attaches aggregate metrics to
the existing job — computed on the same pass, retrieved driver-side after
the action. This pins the API working on the engine's session for the
shapes the pipeline cares about (ingest audit: volume, null keys, value
range), including through a filter chain (metrics see post-filter rows).
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def test_observe_audits_the_flowed_rows(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    obs = Observation("ingest_audit")
    flowed = (
        ev.filter(F.col("event_type") != "error")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("user_id").isNull().cast("long")).alias("null_keys"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_type = {r.event_type: r.n for r in flowed.collect()}
    m = obs.get
    # metrics describe the POST-filter stream, same pass as the query
    assert m["n_rows"] == sum(per_type.values())
    assert "error" not in per_type
    assert m["null_keys"] == 0
    assert m["min_value"] <= m["max_value"]
    # and they equal an independent audit query
    audit = ev.filter(F.col("event_type") != "error").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    ).collect()[0]
    assert (m["n_rows"], m["min_value"], m["max_value"]) == (
        audit.n,
        audit.lo,
        audit.hi,
    )
