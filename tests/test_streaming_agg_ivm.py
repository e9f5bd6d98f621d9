"""Streaming additive IVM: micro-batch replay safety + batch parity.

The sink maintains the daily rollup as epoch partials; these tests pin the
three properties that make it a correct streaming aggregate sink:
parity (stream-of-batches end state == one-shot batch recompute), replay
idempotency (re-applying any epoch leaves the view unchanged — the
checkpoint-recovery contract), and compaction transparency (folding old
epochs changes state size, never the view).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
import real_time_flight_data_pipeline_spark.plans  # noqa: F401  (registers)
from real_time_flight_data_pipeline_spark.sources.parquet import load_table
from real_time_flight_data_pipeline_spark.streaming.agg_ivm import DailyAggState

from .conftest import SF_SMOKE


def _batches(spark, n=3):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "ts", "value")
    return ev, [ev.filter(F.col("event_id") % n == i) for i in range(n)]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_stream_of_batches_matches_batch_recompute(spark, tmp_path):
    ev, batches = _batches(spark)
    state = DailyAggState(spark, str(tmp_path / "agg"))
    for epoch, b in enumerate(batches):
        state.apply_batch(b, epoch)
    want = _rows(REGISTRY["events_daily_agg_ivm"].builder(spark, SF_SMOKE))
    assert _rows(state.view()) == want


def test_epoch_replay_is_idempotent(spark, tmp_path):
    ev, batches = _batches(spark)
    state = DailyAggState(spark, str(tmp_path / "agg"))
    for epoch, b in enumerate(batches):
        state.apply_batch(b, epoch)
    before = _rows(state.view())
    # checkpoint-recovery replays the LAST batch; a mid-stream epoch
    # replay must also be safe (same partials replace themselves)
    state.apply_batch(batches[2], 2)
    state.apply_batch(batches[0], 0)
    assert _rows(state.view()) == before
    # and an amended replay (same epoch, different rows — e.g. upstream
    # dedup changed the batch) REPLACES rather than double-counts
    state.apply_batch(batches[0].limit(0), 0)
    partial_view = _rows(state.view())
    assert partial_view != before  # epoch 0's contribution is gone
    state.apply_batch(batches[0], 0)
    assert _rows(state.view()) == before  # and restored exactly


def test_compaction_preserves_view_and_bounds_state(spark, tmp_path):
    ev, batches = _batches(spark, n=4)
    state = DailyAggState(spark, str(tmp_path / "agg"))
    for epoch, b in enumerate(batches):
        state.apply_batch(b, epoch)
    before = _rows(state.view())
    n_rows_before = state.table.read().count()
    state.compact(up_to_epoch=2)  # epochs 0-2 fold into the base epoch
    assert _rows(state.view()) == before
    assert state.table.read().count() < n_rows_before
    epochs = {
        r.epoch_id for r in state.table.read().select("epoch_id").distinct().collect()
    }
    assert epochs == {-1, 3}
    # post-compaction epochs keep working
    state.apply_batch(batches[3], 3)
    assert _rows(state.view()) == before
    # a replay of a COMPACTED epoch must fail loudly (its partials were
    # folded into the base epoch — re-applying would double-count); the
    # watermark is persisted, so a fresh handle enforces it too
    import pytest as _pytest

    for handle in (state, DailyAggState(spark, str(tmp_path / "agg"))):
        with _pytest.raises(ValueError, match="compaction watermark"):
            handle.apply_batch(batches[0], 0)
    assert _rows(state.view()) == before
    # the watermark is monotone: compacting BELOW the horizon is
    # rejected (a lower persisted value would re-open final epochs)...
    with _pytest.raises(ValueError, match="monotone"):
        state.compact(up_to_epoch=1)
    assert _rows(state.view()) == before
    # ...but an == re-compact is allowed and idempotent — that is the
    # crash-recovery path (the watermark commits BEFORE the fold, so a
    # crash between the two re-runs compact at the same horizon)
    state.compact(up_to_epoch=2)
    assert _rows(state.view()) == before
    # cross-handle freshness (r7 review: a version-blind cache let a
    # second handle regress the watermark): a handle that cached the
    # PRE-compaction horizon must still reject stale epochs after
    # another handle advanced it — the cache revalidates against the
    # watermark table's commit pointer.
    early = DailyAggState(spark, str(tmp_path / "agg"))
    early.apply_batch(batches[3], 3)  # populates early's cache (wm=2)
    state.compact(up_to_epoch=3)
    with _pytest.raises(ValueError, match="compaction watermark"):
        early.apply_batch(batches[3], 3)
    with _pytest.raises(ValueError, match="monotone"):
        early.compact(up_to_epoch=2)


def test_real_stream_drives_the_sink(spark, tmp_path):
    """The same sink under an actual readStream: spool the events table as
    parquet shards, stream them with availableNow, foreachBatch applies
    epochs — final view equals the batch recompute. (The unit tests above
    drive epochs by hand; this closes the loop on the real API.)"""
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "ts", "value")
    spool = str(tmp_path / "spool")
    # three files so the file source has several batches available
    ev.filter(F.col("event_id") % 3 == 0).write.parquet(spool)
    ev.filter(F.col("event_id") % 3 == 1).write.mode("append").parquet(spool)
    ev.filter(F.col("event_id") % 3 == 2).write.mode("append").parquet(spool)

    state = DailyAggState(spark, str(tmp_path / "agg"))
    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(spool)
        .writeStream.foreachBatch(
            lambda batch, epoch: state.apply_batch(batch, epoch)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    want = _rows(REGISTRY["events_daily_agg_ivm"].builder(spark, SF_SMOKE))
    assert _rows(state.view()) == want
