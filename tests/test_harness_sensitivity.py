"""Mutation tests for the oracle harness itself: a gate is only as good as
its ability to fail. Each test injects a specific defect class into a known-
green query and asserts the comparison rejects it with the right reason —
so a silent weakening of the harness (the r1/r2 failure mode, where local
green did not imply driver green) becomes a test failure here."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY

from .conftest import SF_CORRECT
from .oracle_harness import compare


def test_detects_value_mutation(spark):
    q = REGISTRY["pricing_summary"]
    bad = lambda s, d: q.builder(s, d).withColumn(  # noqa: E731
        "sum_qty", F.col("sum_qty") + 1
    )
    ok, msg = compare(spark, SF_CORRECT, bad, q.oracle)
    assert not ok and "value mismatch" in msg


def test_detects_rowcount_mutation(spark):
    q = REGISTRY["route_distinct_pairs"]
    bad = lambda s, d: q.builder(s, d).limit(5)  # noqa: E731
    ok, msg = compare(spark, SF_CORRECT, bad, q.oracle)
    assert not ok and "rowcount mismatch" in msg


def test_detects_schema_mutation(spark):
    q = REGISTRY["ontime_rate_by_type"]
    bad = lambda s, d: q.builder(s, d).withColumnRenamed(  # noqa: E731
        q.builder(s, d).columns[-1], "wrong_name"
    )
    ok, msg = compare(spark, SF_CORRECT, bad, q.oracle)
    assert not ok and "schema mismatch" in msg


def test_detects_nested_output_type(spark):
    q = REGISTRY["docs_exact_dedup"]
    bad = lambda s, d: q.builder(s, d).withColumn(  # noqa: E731
        "bad_col", F.array(F.lit(1))
    )
    ok, msg = compare(spark, SF_CORRECT, bad, q.oracle)
    assert not ok and "nested type" in msg
