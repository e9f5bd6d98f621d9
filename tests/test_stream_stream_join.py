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


def test_stream_stream_left_outer_join_emits_nulls(spark, tmp_path):
    """Left-outer stream-stream join: unmatched clicks must surface with
    NULL purchase ids once the watermark closes their join window — the
    semantics a batch left join gets for free but streaming only reaches
    via state eviction. Parity contract: inner matches equal the batch
    inner join exactly; every emitted null row is a true batch anti-join
    row AND its 1-hour window is closed by the final global watermark
    (rows still inside the open window are legitimately withheld).

    The source replays four ts-quartile slices written SEQUENTIALLY (the
    file source picks up oldest-mod-time first), so micro-batches arrive
    in event-time order — with an aggressive (5 min) watermark an
    unordered file layout would make most rows late-and-dropped, which is
    a property of the replay harness, not of the join."""
    import time as _time

    from pyspark.sql import Window as W

    ev = load_table(spark, SF, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    src = tmp_path / "src"
    bucketed = ev.withColumn(
        "q", F.ntile(4).over(W.orderBy("ts"))
    ).localCheckpoint(eager=True)
    for i in range(1, 5):
        bucketed.filter(F.col("q") == i).drop("q").coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        _time.sleep(1.1)  # distinct mtimes -> deterministic pickup order

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    s_clicks, s_purch = _sides(stream)
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    out = (
        s_clicks.withWatermark("click_ts", "5 minutes")
        .join(
            s_purch.withWatermark("p_ts", "5 minutes"),
            cond,
            "leftOuter",
        )
        .select("user_id", "click_id", "click_ts", "p_id")
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_left_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_lo"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.sql("SELECT * FROM ssj_left_out").collect()
    got_inner = sorted((r.user_id, r.click_id, r.p_id) for r in got if r.p_id is not None)
    got_nulls = {(r.user_id, r.click_id) for r in got if r.p_id is None}

    b_clicks, b_purch = _sides(ev)
    want_inner = sorted(
        map(tuple, _joined(b_clicks, b_purch).collect())
    )
    assert got_inner == want_inner

    # Global watermark after draining: min over the two inputs of max
    # event time minus the 5-minute delay. Null rows may only cover clicks
    # whose whole window is closed, and every one must be a genuine batch
    # anti row.
    import datetime as dt

    wm = min(
        b_clicks.agg(F.max("click_ts")).head()[0],
        b_purch.agg(F.max("p_ts")).head()[0],
    ) - dt.timedelta(minutes=5)
    anti = {
        (r.user_id, r.click_id)
        for r in b_clicks.join(
            b_purch, cond, "left_anti"
        ).collect()
    }
    assert got_nulls, "no null-padded rows emitted — outer semantics untested"
    assert got_nulls <= anti
    null_ts = {
        (r.user_id, r.click_id): r.click_ts for r in got if r.p_id is None
    }
    for key, cts in null_ts.items():
        assert cts + dt.timedelta(hours=1) <= wm, (
            f"null row {key} emitted before its window closed"
        )


def test_stream_stream_full_outer_join_pads_both_sides(spark, tmp_path):
    """FULL outer stream-stream join (r6 verdict #5, completing the
    inner/left matrix): unmatched CLICKS surface with NULL purchase ids
    AND unmatched PURCHASES surface with NULL click ids once the
    watermark closes their window. Parity contract mirrors the
    left-outer test: inner matches equal the batch inner join exactly;
    every click-side null row is a true batch left-anti row with its
    1-hour window closed by the final global watermark; every
    purchase-side null row is a true batch right-anti row whose own
    event time has passed the watermark. Same event-time-ordered
    four-slice replay harness."""
    import datetime as dt
    import time as _time

    from pyspark.sql import Window as W

    ev = load_table(spark, SF, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    src = tmp_path / "src"
    bucketed = ev.withColumn(
        "q", F.ntile(4).over(W.orderBy("ts"))
    ).localCheckpoint(eager=True)
    for i in range(1, 5):
        bucketed.filter(F.col("q") == i).drop("q").coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        _time.sleep(1.1)  # distinct mtimes -> deterministic pickup order

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    s_clicks, s_purch = _sides(stream)
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    out = (
        s_clicks.withWatermark("click_ts", "5 minutes")
        .join(
            s_purch.withWatermark("p_ts", "5 minutes"),
            cond,
            "fullOuter",
        )
        .select("user_id", "click_id", "click_ts", "p_user", "p_id", "p_ts")
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_full_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_fo"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.sql("SELECT * FROM ssj_full_out").collect()
    got_inner = sorted(
        (r.user_id, r.click_id, r.p_id)
        for r in got
        if r.p_id is not None and r.click_id is not None
    )
    got_click_nulls = {
        (r.user_id, r.click_id) for r in got if r.p_id is None
    }
    got_purch_nulls = {
        (r.p_user, r.p_id) for r in got if r.click_id is None
    }

    b_clicks, b_purch = _sides(ev)
    want_inner = sorted(map(tuple, _joined(b_clicks, b_purch).collect()))
    assert got_inner == want_inner
    assert len(want_inner) > 0

    wm = min(
        b_clicks.agg(F.max("click_ts")).head()[0],
        b_purch.agg(F.max("p_ts")).head()[0],
    ) - dt.timedelta(minutes=5)
    left_anti = {
        (r.user_id, r.click_id)
        for r in b_clicks.join(b_purch, cond, "left_anti").collect()
    }
    right_anti = {
        (r.p_user, r.p_id)
        for r in b_purch.join(b_clicks, cond, "left_anti").collect()
    }
    assert got_click_nulls, "no click-side null rows — left padding untested"
    assert got_purch_nulls, "no purchase-side null rows — right padding untested"
    assert got_click_nulls <= left_anti
    assert got_purch_nulls <= right_anti
    # window-closure contract, per side
    click_null_ts = {
        (r.user_id, r.click_id): r.click_ts for r in got if r.p_id is None
    }
    for key, cts in click_null_ts.items():
        assert cts + dt.timedelta(hours=1) <= wm, (
            f"click null row {key} emitted before its window closed"
        )
    purch_null_ts = {
        (r.p_user, r.p_id): r.p_ts for r in got if r.click_id is None
    }
    for key, pts in purch_null_ts.items():
        assert pts <= wm, (
            f"purchase null row {key} emitted before the watermark passed it"
        )
