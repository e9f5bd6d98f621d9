"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

A sort-on-write layout prunes row groups for ONE column (see
tests/test_sorted_layout_pruning.py). When scans filter on two or more
independent columns — (user_id, day), (lat, lon), (tenant, ts) — a linear
sort concentrates statistics for the leading column only: every row group
still spans the full range of the second column, so its predicates prune
nothing. Z-ordering interleaves the bits of the dimensions so that rows
close in the multi-dimensional space land close in the sort order; each
row group then covers a bounded rectangle of the key space, and min/max
footer statistics prune on EVERY interleaved dimension.

Everything here is pure JVM bit arithmetic (shiftright / bitwise AND /
shiftleft / OR) — whole-stage-codegens, no UDFs — so the z-key costs one
projection at write time. At 100 TB this is the standard layout for
multi-predicate scan tables (Delta/Iceberg expose the same operation as
OPTIMIZE ZORDER BY); here it composes with a plain
``sortWithinPartitions(zorder_key(...))`` before ``write.parquet``.

No reference citation: the reference's single Postgres heap table has no
layout control at all; this is part of the 100 TB scale tier.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucketize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column from [lo, hi] onto integer buckets
    [0, 2**bits): the rank-normalization step before bit interleaving.

    Bounds are explicit (not computed) so the expression stays a pure
    projection; at scale they come from table statistics or a prior
    1-row min/max aggregate. Values outside [lo, hi] clamp to the edge
    buckets, so a stale bound degrades pruning, never correctness.
    """
    n = 1 << bits
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(
        float(hi - lo) if hi > lo else 1.0
    )
    bucket = F.floor(scaled * n).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), bucket))


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    already-bucketized column. Column j's bit i lands at output position
    ``i * len(cols) + j``, so all columns contribute equally at every
    scale of the curve. Inputs must be non-negative and < 2**bits
    (use :func:`bucketize`); total output bits = bits * len(cols) must
    fit a long (<= 63).
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits * ncols = {bits * n} exceeds a long")
    parts = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("z_key")
