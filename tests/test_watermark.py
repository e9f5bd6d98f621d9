"""T4 watermark export: strict-> semantics + tie-at-boundary safety."""

from __future__ import annotations

from real_time_flight_data_pipeline_spark.streaming.watermark import (
    WatermarkStore,
    next_export_batch,
)


def _view(spark, rows):
    return spark.createDataFrame(rows, "id int, last_updated string")


def test_watermark_basic_advance(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    view = _view(spark, [(1, "t1"), (2, "t2"), (3, "t3")])
    b = next_export_batch(view, store, limit=2)
    assert sorted(r["id"] for r in b.rows.collect()) == [1, 2]
    store.advance(b.new_watermark)
    b2 = next_export_batch(view, store, limit=2)
    assert [r["id"] for r in b2.rows.collect()] == [3]
    store.advance(b2.new_watermark)
    b3 = next_export_batch(view, store, limit=2)
    assert b3.new_watermark is None and b3.rows.count() == 0


def test_watermark_never_splits_tie_group(spark, tmp_path):
    """Reference bug (SURVEY.md §7.5): 4 rows share last_updated t2; limit 3
    would ship part of the group and strict-> would skip the rest forever.
    Our batch stops before the tied group, then ships it whole."""
    store = WatermarkStore(str(tmp_path / "wm.json"))
    view = _view(
        spark,
        [(1, "t1"), (2, "t2"), (3, "t2"), (4, "t2"), (5, "t2"), (6, "t3")],
    )
    b = next_export_batch(view, store, limit=3)
    assert sorted(r["id"] for r in b.rows.collect()) == [1]  # stop before ties
    assert b.new_watermark == "t1"
    store.advance(b.new_watermark)

    b2 = next_export_batch(view, store, limit=3)  # single over-limit group: ship whole
    assert sorted(r["id"] for r in b2.rows.collect()) == [2, 3, 4, 5]
    assert b2.new_watermark == "t2"
    store.advance(b2.new_watermark)

    b3 = next_export_batch(view, store, limit=3)
    assert sorted(r["id"] for r in b3.rows.collect()) == [6]
    store.advance(b3.new_watermark)
    assert next_export_batch(view, store, limit=3).new_watermark is None
    # nothing was lost and nothing shipped twice
