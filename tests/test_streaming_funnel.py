"""Streaming funnel parity: the applyInPandasWithState funnel's final state
must equal the batch funnel_view_click_purchase query on the same events.

Two replay regimes, both asserted equal to the batch query:
- event-time-ordered (global ts sort split into sequential files) — the
  benign arrival order;
- deterministically SHUFFLED (md5-ordered rows split into files) — clicks
  can arrive before their views, purchases before clicks, across trigger
  boundaries. The order-independent candidate-list fold must converge to
  the same final rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
from real_time_flight_data_pipeline_spark.sources.parquet import load_table
from real_time_flight_data_pipeline_spark.streaming.stateful import (
    running_funnel_state,
)

from .conftest import SF_SMOKE


def _replay_files(ev, src, order_cols, n_files=4):
    """Write ev as n_files sequential parquet files in the given row order
    (single partition => monotonically_increasing_id is contiguous 0..n-1,
    making the split deterministic)."""
    n = ev.count()
    ordered = (
        ev.orderBy(*order_cols)
        .coalesce(1)
        .withColumn(
            "part", (F.monotonically_increasing_id() * n_files / n).cast("int")
        )
        .cache()
    )
    ordered.count()
    for p in range(n_files):
        ordered.filter(F.col("part") == p).drop("part").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{p}"))
    ordered.unpersist()


def _run_funnel_stream(spark, src, ckpt, name):
    stream = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    q = (
        running_funnel_state(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    hist = spark.sql(f"SELECT * FROM {name}").collect()
    assert hist, "stream emitted nothing"
    final = {}
    for r in hist:  # latest emission per user = max monotone n_seen
        cur = final.get(r.user_id)
        if cur is None or r.n_seen > cur.n_seen:
            final[r.user_id] = r
    return {
        u: (r.view_ts, r.click_ts, r.purchase_ts, r.reached_stage)
        for u, r in final.items()
    }


def _batch_want(spark):
    return {
        r.user_id: (r.view_ts, r.click_ts, r.purchase_ts, r.reached_stage)
        for r in REGISTRY["funnel_view_click_purchase"]
        .builder(spark, SF_SMOKE)
        .collect()
    }


def test_streaming_funnel_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "event_type", "ts")
    src = tmp_path / "funnel_src"
    _replay_files(ev, src, ["ts", "user_id"])
    got = _run_funnel_stream(spark, src, tmp_path / "funnel_ckpt", "funnel_out")
    want = _batch_want(spark)
    assert got == want
    assert any(v[3] == 3 for v in want.values()), "corpus reaches full funnel"


def test_streaming_funnel_shuffled_replay_matches_batch(spark, tmp_path):
    """Out-of-order arrival: rows md5-shuffled across 4 triggers. A user's
    purchase can be delivered two triggers before their first view; the
    final per-user state must still equal the batch funnel."""
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "event_type", "ts")
    src = tmp_path / "funnel_shuf_src"
    shuffle_key = F.md5(
        F.concat_ws("|", F.col("user_id"), F.col("event_type"), F.col("ts"))
    )
    _replay_files(ev, src, [shuffle_key])
    got = _run_funnel_stream(
        spark, src, tmp_path / "funnel_shuf_ckpt", "funnel_shuf_out"
    )
    assert got == _batch_want(spark)

