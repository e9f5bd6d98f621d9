"""Streaming exact dedup: dropDuplicatesWithinWatermark as a true streaming
query over a duplicated source must emit each key once — the streaming twin
of the batch exact-dedup operators, with state bounded by the watermark
(keys older than the delay are evicted, so state never grows unboundedly —
the property that makes streaming dedup viable at ingest scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_drop_duplicates_within_watermark_streaming(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("event_id", "ts", "user_id")
    # duplicated source: every event written twice across different files,
    # so duplicates arrive in different micro-batches
    src = tmp_path / "stream_src"
    ev.repartition(2).write.mode("overwrite").parquet(str(src))
    ev.repartition(3).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(str(tmp_path / "out"))
    n_total = ev.count()
    assert got.count() == n_total  # each duplicate pair collapsed to one
    assert got.select("event_id").distinct().count() == n_total
    # value parity with the batch dedup on the duplicated input
    batch = ev.unionByName(ev).dropDuplicates(["event_id"])
    assert got.select(F.sum("user_id")).first()[0] == batch.select(
        F.sum("user_id")
    ).first()[0]


def test_available_now_trigger_processes_all_then_stops(spark, tmp_path):
    """Trigger.AvailableNow (T8): drain everything currently in the source
    in bounded micro-batches, then terminate — the batch-parity execution
    mode for catch-up runs, vs the reference's fixed 60s polling cadence."""
    ev = load_table(spark, SF, "events").select("event_id", "user_id")
    src = tmp_path / "src"
    ev.repartition(3).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive  # terminated on its own after draining
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == ev.count()
