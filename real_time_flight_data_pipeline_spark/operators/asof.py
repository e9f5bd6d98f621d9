"""As-of (most-recent-event) join — an operator Spark has no primitive for.

Implemented per the escalation ladder (SURVEY.md §7.3 / pyspark_guide): as a
*composition of built-in ops*, not a UDF. The classic scalable construction:

  1. Tag both sides and UNION them into one stream.
  2. One window per key ordered by (ts, side, tiebreak) — the right side
     sorts before the left at equal timestamps so "at-or-before" is
     inclusive.
  3. ``last(right_value, ignoreNulls)`` over an unbounded-preceding frame
     carries the most recent right-side value forward.
  4. Keep only left-side rows.

Cost model: ONE shuffle on the join key and one per-partition sort — the
same cost as a single window function, independent of how many right rows
precede each left row. A naive inequality join would be O(left x right)
per key; ``merge_asof``-style applyInPandas would pay Arrow transfer. This
shape survives 100 TB (and skewed keys can be salted like any window).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each left row: values from the latest right row with
    ``right_ts <= left_ts`` (or ``<`` when inclusive=False), per key.

    Returns all left columns plus ``asof_<col>`` for each requested right
    value column (NULL when no right row precedes). When several right rows
    share the winning timestamp the carried value is the one latest in
    (ts, value) order — deterministic for single-column values.
    """
    keys = list(on)
    lcols = left.columns
    l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_rv_{c}") for c in value_cols],
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l.schema["_lrow"].dataType.simpleString()
        ).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    side_order: Column = F.col("_side").asc() if inclusive else F.col("_side").desc()
    merged = l.unionByName(r)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), side_order, *[F.col(f"_rv_{c}").asc() for c in value_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(F.col(f"_rv_{c}"), ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_lrow.*"),
        *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )
    return out
