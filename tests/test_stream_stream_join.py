"""Stream-stream join parity: watermarked click->purchase interval join under
Structured Streaming must equal the batch join (T-coverage beyond the
reference: the reference never joins two live streams)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _sides(df):
    clicks = df.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    purchases = df.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    return clicks, purchases


def _joined(clicks, purchases):
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return clicks.join(purchases, cond).select("user_id", "click_id", "p_id")


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("user_id", "event_id", "event_type", "ts")
    src = tmp_path / "src"
    ev.repartition(4).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    s_clicks, s_purch = _sides(stream)
    out = _joined(
        s_clicks.withWatermark("click_ts", "31 days"),
        s_purch.withWatermark("p_ts", "31 days"),
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(map(tuple, spark.sql("SELECT * FROM ssj_out").collect()))
    b_clicks, b_purch = _sides(ev)
    want = sorted(map(tuple, _joined(b_clicks, b_purch).collect()))
    assert got == want
    assert len(want) > 0
