"""Stream-built SCD2 == batch rebuild (r6 verdict #6).

operators/scd2.scd2_apply is folding-proven in hand-driven batch replays
(test_scd2.py); this closes the loop on the real streaming API: an
availableNow file stream drives streaming.scd2_state.Scd2State through
foreachBatch, and the resulting history must equal user_state_scd2_from's
one-shot rebuild row-for-row. Also pins checkpoint-recovery semantics:
replaying the final micro-batch against the committed state is a no-op.
"""

from __future__ import annotations

import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.plans.relational_ext import (
    user_state_scd2_from,
)
from real_time_flight_data_pipeline_spark.sources.parquet import load_table
from real_time_flight_data_pipeline_spark.streaming.scd2_state import Scd2State

from .conftest import SF_SMOKE


def _events(spark):
    """Events restricted to one observation per (user_id, ts): the fold's
    ordering contract is event-time order ACROSS batches, and two same-ts
    rows for one user split across a batch boundary would hit the
    stale-drop rule where the rebuild's event_id tie-break still orders
    them — a harness artifact, not an operator property, so the parity
    corpus removes the ambiguity (within a batch, equal ts is fine: the
    tie column is passed through)."""
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id", "ts").orderBy("event_id")
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def test_available_now_stream_builds_scd2(spark, tmp_path):
    ev = _events(spark)
    # Four ts-quartile slices written SEQUENTIALLY (distinct mtimes): the
    # file source picks up oldest-first, so micro-batches arrive in
    # event-time order — the fold's documented ordering contract. Same
    # harness as test_stream_stream_join's left-outer replay.
    src = tmp_path / "src"
    bucketed = ev.withColumn(
        "q", F.ntile(4).over(Window.orderBy("ts", "event_id"))
    ).localCheckpoint(eager=True)
    for i in range(1, 5):
        bucketed.filter(F.col("q") == i).drop("q").coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        time.sleep(1.1)

    state = Scd2State(spark, str(tmp_path / "scd2"), tie_cols=("event_id",))

    def _sink(batch, epoch):
        state.apply_batch(
            batch.select(
                "user_id", F.col("event_type").alias("state"), "ts", "event_id"
            ),
            epoch,
        )

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        map(
            tuple,
            state.read()
            .select("user_id", "version", "state", "valid_from", "valid_to")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            user_state_scd2_from(ev)
            .select("user_id", "version", "state", "valid_from", "valid_to")
            .collect(),
        )
    )
    assert got == want
    assert len(want) > 0

    # Checkpoint-recovery contract: replaying the LAST slice against the
    # committed state must be a no-op (every row is stale or same-state).
    last = bucketed.filter(F.col("q") == 4).select(
        "user_id", F.col("event_type").alias("state"), "ts", "event_id"
    )
    state.apply_batch(last, epoch_id=99)
    assert (
        sorted(
            map(
                tuple,
                state.read()
                .select("user_id", "version", "state", "valid_from", "valid_to")
                .collect(),
            )
        )
        == got
    )


def test_multi_row_batches_match_per_event_fold(spark):
    """scd2_apply with MANY rows per key per batch (the r6 ADVICE gap:
    multi-row batches used to corrupt state silently) must equal the
    rebuild — the within-batch gaps-and-islands collapse is exercised by
    feeding each user's first 8 events as TWO 4-event batches."""
    ev = (
        _events(spark)
        .filter(F.col("user_id") < 6)
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 8)
        .localCheckpoint(eager=True)
    )
    state = spark.createDataFrame(
        [],
        "user_id long, version int, event_type string, "
        "valid_from timestamp, valid_to timestamp",
    )
    from real_time_flight_data_pipeline_spark.operators.scd2 import scd2_apply

    for lo, hi in ((1, 4), (5, 8)):
        batch = ev.filter(F.col("rn").between(lo, hi)).select(
            "user_id", "event_type", "ts", "event_id"
        )
        state = scd2_apply(
            state,
            batch,
            state_col="event_type",
            tie_cols=("event_id",),
        ).localCheckpoint(eager=True)
    want = user_state_scd2_from(ev.drop("rn")).select(
        "user_id", "version", "state", "valid_from", "valid_to"
    )
    assert sorted(map(tuple, state.collect())) == sorted(
        map(tuple, want.collect())
    )
