"""Sort-on-write data layout: the row-group skipping story.

Parquet stores min/max statistics per row group; a reader that pushes a
predicate down can skip every row group whose [min, max] cannot match.
Whether skipping actually happens is a product of TWO facts, each asserted
here on its own layer:

1. LAYOUT: sorting on the filter column before writing makes each row
   group's [min, max] a narrow slice, so a point predicate overlaps ~1 of
   them — verified directly from the parquet footers (engine-independent,
   deterministic). An unsorted write leaves every row group spanning the
   full key range — every group overlaps, nothing can be skipped.
2. PUSHDOWN: Spark pushes the predicate into the scan (PushedFilters),
   so the reader sees it at footer-evaluation time. (The broader pushdown
   gate is tests/test_scan_pushdown.py; asserted again here on exactly
   this query.)

At 100 TB this is the cheapest scan optimization there is: one sort at
write time (already shuffled data is often nearly free to sort) buys
point/range scans that touch a vanishing fraction of row groups. The
results are identical either way — layout is performance, not semantics.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.sources.parquet import load_table

from .conftest import SF_CORRECT

_KEY = 42
_ROW_GROUP_BYTES = 64 * 1024  # many small groups even at test scale


def _matching_row_groups(path: str, key: int) -> tuple[int, int]:
    """(row groups whose user_id [min,max] covers key, total row groups)
    across every parquet part file under path."""
    import glob
    import os

    match = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        }["user_id"]
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(idx).statistics
            total += 1
            if st.min <= key <= st.max:
                match += 1
    return match, total


def test_sorted_write_concentrates_row_group_stats(spark, tmp_path):
    ev = load_table(spark, SF_CORRECT, "events")
    # Runtime spark.conf can't reach the writer's Hadoop conf — set the
    # parquet row-group size on the JVM Hadoop configuration directly.
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev = hconf.get("parquet.block.size", None)
    hconf.set("parquet.block.size", str(_ROW_GROUP_BYTES))
    try:
        unsorted_dir = str(tmp_path / "unsorted")
        sorted_dir = str(tmp_path / "sorted")
        ev.repartition(1).write.mode("overwrite").parquet(unsorted_dir)
        (
            ev.repartition(1)
            .sortWithinPartitions("user_id")
            .write.mode("overwrite")
            .parquet(sorted_dir)
        )
    finally:
        if prev is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", prev)

    m_unsorted, n_unsorted = _matching_row_groups(unsorted_dir, _KEY)
    m_sorted, n_sorted = _matching_row_groups(sorted_dir, _KEY)
    assert n_unsorted >= 4, "need multiple row groups for the test to mean anything"
    # unsorted: random arrival order -> every group spans the key range
    assert m_unsorted == n_unsorted
    # sorted: the key lives in a handful of contiguous groups
    assert m_sorted * 4 <= n_sorted, (
        f"sorted layout should prune >=75% of row groups: "
        f"{m_sorted}/{n_sorted} match key {_KEY}"
    )

    # Spark pushes the predicate into the scan on this exact query, and the
    # answer is layout-independent.
    q_sorted = spark.read.parquet(sorted_dir).filter(F.col("user_id") == _KEY)
    q_unsorted = spark.read.parquet(unsorted_dir).filter(
        F.col("user_id") == _KEY
    )
    plan = q_sorted._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters")[1][:200]
    assert q_sorted.count() == q_unsorted.count() > 0
