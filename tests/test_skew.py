"""Salting operators: results must equal the unsalted plan on heavily skewed
data, and the salted join must actually join on (key, salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.operators.skew import (
    salted_equi_join,
    salted_sum_count,
)


def _skewed(spark, n=20000):
    # 90% of rows share key 0; values unique so salts scatter
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 97).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.range(97).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    plain = big.join(small, "k").select("k", "v", "dim_val")
    salted = salted_equi_join(big, small, ["k"], n_salts=8).select("k", "v", "dim_val")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    left_plain = big.join(small.filter(F.col("k") > 50), "k", "left")
    left_salted = salted_equi_join(big, small.filter(F.col("k") > 50), ["k"], 8, "left")
    assert sorted(map(tuple, left_salted.collect())) == sorted(
        map(tuple, left_plain.collect())
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"],): (r["n"], r["sum_v"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .collect()
    }
    salted = {
        (r["k"],): (r["n"], r["sum_v"])
        for r in salted_sum_count(df, ["k"], ["v"], n_salts=8).collect()
    }
    assert salted == plain


def test_salted_join_plan_uses_salt_key(spark):
    big = _skewed(spark)
    small = spark.range(97).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    plan = (
        salted_equi_join(big, small, ["k"], n_salts=8)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "_salt" in plan
