"""Streaming funnel parity: the applyInPandasWithState funnel's final state
must equal the batch funnel_view_click_purchase query on the same events.

The stream replays sf0.001 events in event-time order (global ts sort split
into sequential files, one per trigger) — the arrival regime under which
the O(1)-state streaming operator is exact; the batch query remains the
reconciliation path for unordered data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
from real_time_flight_data_pipeline_spark.sources.parquet import load_table
from real_time_flight_data_pipeline_spark.streaming.stateful import (
    running_funnel_state,
)

from .conftest import SF_SMOKE


def test_streaming_funnel_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "event_type", "ts")
    src = tmp_path / "funnel_src"
    # Event-time-ordered replay: 4 sequential ts-range files.
    n = ev.count()
    # Single partition => monotonically_increasing_id is contiguous 0..n-1,
    # making the 4-way range split deterministic and ts-ordered.
    ordered = (
        ev.orderBy("ts", "user_id")
        .coalesce(1)
        .withColumn("part", (F.monotonically_increasing_id() * 4 / n).cast("int"))
        .cache()
    )
    ordered.count()
    for p in range(4):
        ordered.filter(F.col("part") == p).drop("part").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{p}"))

    stream = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    q = (
        running_funnel_state(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_out")
        .option("checkpointLocation", str(tmp_path / "funnel_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    hist = spark.sql("SELECT * FROM funnel_out").collect()
    assert hist, "stream emitted nothing"
    final = {}
    for r in hist:  # latest emission per user = max monotone n_seen
        cur = final.get(r.user_id)
        if cur is None or r.n_seen > cur.n_seen:
            final[r.user_id] = r
    got = {
        u: (r.view_ts, r.click_ts, r.purchase_ts, r.reached_stage)
        for u, r in final.items()
    }
    want = {
        r.user_id: (r.view_ts, r.click_ts, r.purchase_ts, r.reached_stage)
        for r in REGISTRY["funnel_view_click_purchase"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    assert got == want
    assert any(v[3] == 3 for v in want.values()), "corpus reaches full funnel"
