"""Range join without a nested-loop plan: grid blocking.

A naive ``a.val BETWEEN r.lo AND r.hi`` join has no equi-key, so Spark plans
BroadcastNestedLoopJoin (or worse, a cartesian product) — O(n * ranges) row
comparisons. Grid blocking recovers an equi join: pick a grid width, map
every value to its cell ``floor(val / grid)``, replicate each range onto
every cell it covers, then hash-join on the cell and post-filter the exact
bounds. Each (value, range) match is produced exactly once (through the
value's own cell), so no dedup is needed. Cost: ranges replicated by
ceil(width / grid) — choose ``grid`` near the typical range width.

This is the standard interval-join strategy in distributed engines; the
streaming twin is the watermarked interval join in
tests/test_stream_stream_join.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CELL = "_cell"


def grid_range_join(
    values: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    grid: float,
    how: str = "inner",
) -> DataFrame:
    """Join ``values`` rows to ``ranges`` rows where lo <= value < hi.

    Both inputs keep all their columns. ``grid`` is the cell width; ranges
    are exploded onto floor(lo/grid)..floor(hi/grid) inclusive (the hi cell
    is kept because the post-filter is half-open and cheap).
    """
    if how != "inner":
        raise ValueError("grid_range_join is an inner range join")
    for side, df in (("values", values), ("ranges", ranges)):
        if _CELL in df.columns:
            raise ValueError(
                f"grid_range_join: {side} input already has a '{_CELL}' column"
            )
    v = values.withColumn(_CELL, F.floor(F.col(value_col) / grid))
    # Inverted ranges (lo > hi) would make F.sequence emit a descending cell
    # list and replicate junk rows the post-filter then discards; they can
    # never match the half-open predicate, so drop them before exploding.
    r = ranges.filter(F.col(lo_col) <= F.col(hi_col)).withColumn(
        _CELL,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / grid), F.floor(F.col(hi_col) / grid)
            )
        ),
    )
    return (
        v.join(r, _CELL)
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop(_CELL)
    )
