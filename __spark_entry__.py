"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (latest-per-key dedup -> broadcast
star join -> BI labels) on sf0.001. ``queries()`` exposes every implemented
operator from SURVEY.md §2 plus the north-star ops; ``oracle_sql()`` gives
the DuckDB-equivalent ANSI SQL per query — every registered query has one
(engine-specific approx sketches emit an engine-side error-bound check the
oracle predicts, so even those hash-compare).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["curated_event_star_view"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
