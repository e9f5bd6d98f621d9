"""Latest-per-key deduplication — the reference's most load-bearing operator.

The reference expresses it 7x as Postgres ``DISTINCT ON (key) ... ORDER BY
key, ingest_time DESC`` (apps/loader/load_warehouse.py:34-213). Two Spark
forms are provided:

* ``latest_per_key`` — aggregation form: ``max_by(struct(*row), ord)``.
  This is the scale path: partial aggregation reduces each input partition
  to <=1 row per key before the shuffle, so shuffle volume is O(distinct
  keys), not O(rows). Physical note (measured on Spark 4.1): a struct-typed
  aggregation buffer is not hash-aggregable, so this plans as SortAggregate —
  each partition sorts by the *grouping key only* (not by ord) before
  streaming groups. Still strictly cheaper than the window form, which
  shuffles every row and sorts by (key, ord).
* ``latest_per_key_window`` — ``row_number() over (partition by key order by
  ord desc) = 1``. Shuffles and sorts every row; kept for when the caller
  needs rank>1 rows too (e.g. change history).

Both are deterministic given tiebreak columns that make ``ord`` unique per
key (the Postgres form is NOT deterministic on ties; we fix that and
document the divergence).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ord_struct(order_by: Sequence[str | Column]) -> Column:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return F.struct(*cols)


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """One row per key: the row whose ``order_by`` tuple is greatest.

    NULL ordering: a NULL inside the ord struct sorts low (Spark struct
    comparison), so rows with a NULL order column lose to any non-NULL row —
    same outcome as Postgres ``ORDER BY ingest_time DESC`` default
    (NULLS LAST under DESC).
    """
    payload = F.struct(*[F.col(c) for c in df.columns])
    picked = df.groupBy(*keys).agg(
        F.max_by(payload, _ord_struct(order_by)).alias("_row")
    )
    return picked.select("_row.*")


def latest_per_key_window(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    rank_col: str | None = None,
) -> DataFrame:
    """Window form; optionally keep the rank column (rank_col) for history."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in cols])
    ranked = df.withColumn("_rn", F.row_number().over(w))
    if rank_col:
        return ranked.withColumnRenamed("_rn", rank_col)
    return ranked.filter(F.col("_rn") == 1).drop("_rn")


def distinct_pairs(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """SELECT DISTINCT over a column subset (reference A2, route discovery).
    dropDuplicates = hash-agg with map-side combine; shuffle is O(distinct)."""
    return df.select(*cols).dropDuplicates()
