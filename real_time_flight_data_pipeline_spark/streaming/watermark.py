"""Watermark-driven incremental export (T4).

The reference keeps a single-row state table and ships rows with
``last_updated > last_sync_time ORDER BY last_updated LIMIT n``, advancing
the watermark to the max shipped value (apps/sheets_sink/sheets_sink.py:
88-105, 327-332; db/01_views.sql:25-33). That design loses rows when a
group of rows *ties* on the boundary ``last_updated`` and the LIMIT splits
the group: the next cycle's strict ``>`` skips the unsent remainder
(SURVEY.md §7.5).

Fix (documented divergence): a batch never splits a ``last_updated`` group —
if the limit lands mid-group, the batch is truncated to the previous
complete group. The watermark then always advances past *complete* groups
only. In pure Structured Streaming this whole mechanism is subsumed by the
checkpoint; this batch utility exists for export consumers that need
explicit watermark state (the reference's Sheets-style sink).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class WatermarkStore:
    """Single-value processing-time watermark, JSON file backed (the
    1-row Delta table stand-in)."""

    def __init__(self, path: str):
        self.path = path

    def read(self) -> str | None:
        try:
            with open(self.path) as f:
                return json.load(f)["last_sync_time"]
        except FileNotFoundError:
            return None

    def advance(self, value: str) -> None:
        cur = self.read()
        new = max(cur, value) if cur is not None else value  # GREATEST guard (A3)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_sync_time": new}, f)
        os.replace(tmp, self.path)


@dataclass
class ExportBatch:
    rows: DataFrame
    new_watermark: str | None  # None => nothing to ship


def next_export_batch(
    view: DataFrame,
    store: WatermarkStore,
    ts_col: str = "last_updated",
    limit: int = 300,
) -> ExportBatch:
    """Strict-> watermark filter + ordered batch, tie-safe (never splits a
    ``ts_col`` group across batches)."""
    wm = store.read()
    pending = view if wm is None else view.filter(F.col(ts_col) > F.lit(wm))
    # Over-fetch one row: the (limit+1)-th value tells whether the limit
    # would split a ts group (top-k plan; limit+1 rows reach the driver,
    # same driver-side batch shape as the reference's export loop).
    vals = [r[0] for r in pending.select(ts_col).orderBy(ts_col).limit(limit + 1).collect()]
    if not vals:
        return ExportBatch(pending.limit(0), None)
    if len(vals) <= limit:
        return ExportBatch(pending, str(max(vals)))
    boundary, overflow = vals[limit - 1], vals[limit]
    if overflow != boundary:
        # limit lands exactly between groups: ship all limit rows
        return ExportBatch(
            pending.filter(F.col(ts_col) <= F.lit(boundary)), str(boundary)
        )
    prev = [v for v in vals[:limit] if v != boundary]
    if not prev:
        # a single group larger than the limit: ship it whole (progress
        # guarantee) — never split, never skip
        return ExportBatch(
            pending.filter(F.col(ts_col) <= F.lit(boundary)), str(boundary)
        )
    new_wm = max(prev)
    return ExportBatch(pending.filter(F.col(ts_col) <= F.lit(new_wm)), str(new_wm))
