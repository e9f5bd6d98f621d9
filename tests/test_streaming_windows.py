"""Streaming parity tests: the batch catalog's windowed aggregation run as a
real Structured Streaming query (watermark + tumbling window), and the
custom applyInPandasWithState operator across multiple micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.schemas import EVENTS_SCHEMA
from real_time_flight_data_pipeline_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_tumbling_window_streaming_matches_batch(spark, tmp_path):
    """groupBy(window(ts, 1 day)) under readStream with a watermark must
    produce exactly the batch result once all files are processed (T9 parity:
    the same plan serves batch and streaming)."""
    ev = load_table(spark, SF, "events")
    # stream source: re-write events as parquet with micro-batch-sized files
    src = tmp_path / "stream_src"
    ev.repartition(4).write.mode("overwrite").parquet(str(src))

    stream_schema = ev.schema
    stream = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100).alias(
                "sum_value"
            ),
        )
        .select(F.col("w.start").cast("date").alias("day"), "event_type", "n", "sum_value")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (str(r["day"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    want = {
        (str(r["day"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in (
            ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (
                    F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100
                ).alias("sum_value"),
            )
            .select(
                F.col("w.start").cast("date").alias("day"), "event_type", "n", "sum_value"
            )
            .collect()
        )
    }
    assert got == want


def test_session_window_streaming_matches_batch(spark, tmp_path):
    """groupBy(session_window(ts, 30 min), user_id) under readStream with a
    watermark must equal the batch session_window result — the true-streaming
    twin of the sessionize_events catalog query's gap semantics."""
    ev = load_table(spark, SF, "events").select("user_id", "ts")
    src = tmp_path / "sess_src"
    ev.repartition(4).write.mode("overwrite").parquet(str(src))

    def sessions(df):
        return (
            df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sessions(stream.withWatermark("ts", "31 days"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(map(tuple, spark.sql("SELECT * FROM sess_out").collect()))
    want = sorted(map(tuple, sessions(ev).collect()))
    assert got == want
    assert len(want) > 0


@pytest.mark.parametrize("n_batches", [3])
def test_apply_in_pandas_with_state(spark, tmp_path, n_batches):
    """Custom stateful operator: state accumulates across micro-batches and
    the final per-key snapshot equals the batch latest-per-key golden."""
    import json

    from real_time_flight_data_pipeline_spark.streaming.stateful import (
        running_flight_state,
    )

    rows = [
        # key, ingest, status — K1 updated in every batch, K2 only in first
        ("K1", "2025-08-21T00:10:00", "active", 0),
        ("K2", "2025-08-21T00:20:00", "active", 0),
        ("K1", "2025-08-21T01:10:00", "en-route", 1),
        ("K1", "2025-08-21T02:10:00", "landed", 2),
        ("K2", "2025-08-21T02:20:00", "landed", 2),
    ]
    src = tmp_path / "src"
    src.mkdir()
    for b in range(n_batches):
        batch = [r for r in rows if r[3] == b]
        with open(src / f"b{b}.json", "w") as f:
            for key, ingest, status, _ in batch:
                f.write(
                    json.dumps(
                        {"flight_key": key, "ingest_time": ingest, "status": status}
                    )
                    + "\n"
                )

    stream = (
        spark.readStream.schema("flight_key string, ingest_time timestamp, status string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = running_flight_state(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    hist = spark.sql("SELECT * FROM state_out").collect()
    # final state per key = last emitted row per key (max n_updates)
    final = {}
    for r in hist:
        cur = final.get(r["flight_key"])
        if cur is None or r["n_updates"] > cur["n_updates"]:
            final[r["flight_key"]] = r
    assert final["K1"]["n_updates"] == 3
    assert final["K1"]["last_status"] == "landed"
    assert str(final["K1"]["last_ingest"]) == "2025-08-21 02:10:00"
    assert final["K2"]["n_updates"] == 2
    assert final["K2"]["last_status"] == "landed"
    # K1 state evolved across at least 2 emissions (one per touched batch)
    assert len([r for r in hist if r["flight_key"] == "K1"]) >= 2
