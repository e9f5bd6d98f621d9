"""Stream-static join parity: a streaming fact joined to a static
dimension INSIDE the streaming plan (not in foreachBatch) must equal the
batch join — the everyday enrichment shape where the dimension broadcasts
and the stream never shuffles for the join."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _enriched(events, cust, nation):
    return (
        events.join(cust, events.user_id == cust.c_custkey, "left")
        .join(nation, cust.c_nationkey == nation.n_nationkey, "left")
        .select("event_id", "user_id", "event_type", "n_name")
    )


def test_stream_static_join_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, SF, "nation").select("n_nationkey", "n_name")

    src = tmp_path / "src"
    ev.repartition(3).write.mode("overwrite").parquet(str(src))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = _enriched(stream, cust, nation)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_static_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(map(tuple, spark.sql("SELECT * FROM ss_static_out").collect()))
    want = sorted(map(tuple, _enriched(ev, cust, nation).collect()))
    assert got == want
    assert len(want) > 0
    # The static sides must broadcast: a stream-side shuffle for a dim
    # join is the 100 TB anti-pattern this test pins against.
    bplan = _enriched(ev, cust, nation)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bplan
