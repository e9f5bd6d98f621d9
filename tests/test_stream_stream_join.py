"""Stream-stream join matrix: the watermarked click->purchase interval
join under Structured Streaming must match the batch join in ALL four
modes — inner, leftOuter, rightOuter (r7 verdict #7), fullOuter — from
one parametrized harness (T-coverage beyond the reference: the reference
never joins two live streams).

Parity contract per mode:

* inner matches equal the batch inner join exactly (every mode);
* click-side null padding (leftOuter / fullOuter): every emitted
  (click, NULL) row is a true batch left-anti row AND its 1-hour join
  window is closed by the final global watermark — rows still inside an
  open window are legitimately withheld by streaming semantics;
* purchase-side null padding (rightOuter / fullOuter): every emitted
  (NULL, purchase) row is a true batch right-anti row whose own event
  time has passed the watermark;
* each outer mode must actually emit padding on its padded side(s) —
  otherwise the outer semantics went untested.

The source replays four ts-quartile slices written SEQUENTIALLY (the
file source picks up oldest-mod-time first), so micro-batches arrive in
event-time order — with an aggressive (5 min) watermark an unordered
file layout would make most rows late-and-dropped, which is a property
of the replay harness, not of the join.
"""

from __future__ import annotations

import datetime as dt
import time as _time

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _sides(df):
    clicks = df.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = df.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    return clicks, purchases


def _cond():
    return (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR"))
    )


def _write_ordered_slices(ev, src) -> None:
    bucketed = ev.withColumn(
        "q", F.ntile(4).over(W.orderBy("ts"))
    ).localCheckpoint(eager=True)
    for i in range(1, 5):
        bucketed.filter(F.col("q") == i).drop("q").coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        _time.sleep(1.1)  # distinct mtimes -> deterministic pickup order


# mode -> (pads clicks side, pads purchases side)
_MODES = {
    "inner": (False, False),
    "leftOuter": (True, False),
    "rightOuter": (False, True),
    "fullOuter": (True, True),
}


@pytest.mark.parametrize("mode", sorted(_MODES))
def test_stream_stream_join_matrix_matches_batch(spark, tmp_path, mode):
    pads_left, pads_right = _MODES[mode]
    ev = load_table(spark, SF, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    src = tmp_path / "src"
    _write_ordered_slices(ev, src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    s_clicks, s_purch = _sides(stream)
    out = (
        s_clicks.withWatermark("click_ts", "5 minutes")
        .join(s_purch.withWatermark("p_ts", "5 minutes"), _cond(), mode)
        .select("user_id", "click_id", "click_ts", "p_user", "p_id", "p_ts")
    )
    sink = f"ssj_{mode.lower()}"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.sql(f"SELECT * FROM {sink}").collect()
    got_inner = sorted(
        (r.user_id, r.click_id, r.p_id)
        for r in got
        if r.p_id is not None and r.click_id is not None
    )
    got_click_nulls = {(r.user_id, r.click_id) for r in got if r.p_id is None}
    got_purch_nulls = {(r.p_user, r.p_id) for r in got if r.click_id is None}

    b_clicks, b_purch = _sides(ev)
    want_inner = sorted(
        map(
            tuple,
            b_clicks.join(b_purch, _cond())
            .select("user_id", "click_id", "p_id")
            .collect(),
        )
    )
    assert got_inner == want_inner
    assert len(want_inner) > 0

    if not pads_left:
        assert not got_click_nulls
    if not pads_right:
        assert not got_purch_nulls
    if not (pads_left or pads_right):
        return

    # Global watermark after draining: min over the two inputs of max
    # event time minus the 5-minute delay.
    wm = min(
        b_clicks.agg(F.max("click_ts")).head()[0],
        b_purch.agg(F.max("p_ts")).head()[0],
    ) - dt.timedelta(minutes=5)

    if pads_left:
        left_anti = {
            (r.user_id, r.click_id)
            for r in b_clicks.join(b_purch, _cond(), "left_anti").collect()
        }
        assert got_click_nulls, "no click-side null rows — left padding untested"
        assert got_click_nulls <= left_anti
        click_null_ts = {
            (r.user_id, r.click_id): r.click_ts for r in got if r.p_id is None
        }
        for key, cts in click_null_ts.items():
            assert cts + dt.timedelta(hours=1) <= wm, (
                f"click null row {key} emitted before its window closed"
            )
    if pads_right:
        right_anti = {
            (r.p_user, r.p_id)
            for r in b_purch.join(b_clicks, _cond(), "left_anti").collect()
        }
        assert got_purch_nulls, (
            "no purchase-side null rows — right padding untested"
        )
        assert got_purch_nulls <= right_anti
        purch_null_ts = {
            (r.p_user, r.p_id): r.p_ts for r in got if r.click_id is None
        }
        for key, pts in purch_null_ts.items():
            assert pts <= wm, (
                f"purchase null row {key} emitted before the watermark passed it"
            )
