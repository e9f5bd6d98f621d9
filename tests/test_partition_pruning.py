"""Directory-partition pruning: static, dynamic (DPP), and join hints.

Row-group skipping (test_sorted_layout_pruning / test_zorder_layout) works
WITHIN files; Hive-style directory partitioning prunes whole files before
any footer is opened — the coarsest and cheapest scan cut at 100 TB,
where a fact table is day-partitioned and most queries touch a handful of
days. Three layers asserted here:

1. STATIC pruning: a literal day predicate shows up as a PartitionFilter
   (not a pushed data filter) and the scan reads only that day's files.
2. DYNAMIC partition pruning (DPP): when the day predicate arrives via a
   JOIN to a filtered dimension (the star-schema norm — `WHERE
   d.is_holiday` on a date dim), Catalyst injects a runtime
   dynamicpruning subquery on the fact's partition column. Without DPP
   the fact scan would read every partition and discard rows post-join.
3. Join strategy hints: broadcast / shuffle-hash / sort-merge hints are
   honored, so a query author (or this engine's planner helpers) can pin
   the physical join when statistics mislead at scale.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.sources.parquet import load_table

from .conftest import SF_CORRECT


def _write_day_partitioned(spark, tmp_path) -> str:
    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, SF_CORRECT, "events").withColumn(
        "day", F.to_date("ts")
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(out)
    return out


def test_static_partition_pruning(spark, tmp_path):
    path = _write_day_partitioned(spark, tmp_path)
    n_days = len(glob.glob(path + "/day=*"))
    assert n_days == 30

    df = spark.read.parquet(path).filter(F.col("day") == "2024-01-10")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # The day predicate must be a partition filter, not a data filter.
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "day" not in pushed
    # And it must actually cut the scan: one partition's worth of rows.
    total = spark.read.parquet(path).count()
    assert 0 < df.count() < total / 10


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    path = _write_day_partitioned(spark, tmp_path)
    fact = spark.read.parquet(path)
    # A 30-row date dimension; the filter lives on the DIM, not the fact.
    dim = fact.select("day").distinct().withColumn(
        "day_of_month", F.dayofmonth("day")
    )
    dim_path = str(tmp_path / "dim_day")
    dim.write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    # The dim predicate must be LITERAL-shaped (comparison/IN against
    # constants): Catalyst's isLikelySelective() gates DPP insertion, and
    # a bare boolean attribute filter (`WHERE is_special`) does NOT
    # qualify — root-caused on this exact test; a star schema whose
    # flag columns are booleans silently loses DPP unless the predicate
    # is written as a literal comparison.
    joined = fact.join(dim.filter(F.col("day_of_month").isin(5, 6)), "day")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), (
        "fact scan should carry a runtime DPP subquery on `day`; without "
        "it every partition is read and filtered post-join"
    )
    got = joined.count()
    want = fact.filter(F.dayofmonth("day").isin(5, 6)).count()
    assert got == want > 0


def test_join_strategy_hints_are_honored(spark):
    ev = load_table(spark, SF_CORRECT, "events")
    users = ev.select("user_id").distinct()

    def physical(hint: str) -> str:
        j = ev.join(users.hint(hint), "user_id")
        return j._jdf.queryExecution().executedPlan().toString()

    assert "BroadcastHashJoin" in physical("broadcast")
    assert "ShuffledHashJoin" in physical("shuffle_hash")
    assert "SortMergeJoin" in physical("merge")
