"""AQE skew-join: Spark's runtime answer to the problem operators/skew.py
solves manually. With adaptive execution on, a sort-merge join whose
shuffle produces one pathologically large partition is re-planned at
runtime: the skewed partition is split into sub-partitions and the other
side's matching partition is replicated (OptimizeSkewedJoin) — no salting
code, no plan rewrite, same results. This test proves the mechanism fires
on this engine's session (thresholds lowered so test-scale data
qualifies) and that results are identical to the non-adaptive plan.

The division of labor this repo ships: AQE skew-join covers sort-merge
joins transparently at runtime; `salted_equi_join` / `salted_sum_count`
remain for the shapes AQE cannot split (skewed AGGREGATION keys, and
broadcast-ineligible skew under exchange reuse). COVERAGE.md 'Scale
design notes' carries the argument; this test carries the proof.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_SKEW_CONFS = {
    # qualify tiny test partitions as "skewed"
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    # force the sort-merge path (skew-join only rewrites SMJ/SHJ)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # coalescing can merge away the evidence at this scale
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def _with_confs(spark, confs):
    prev = {}
    for k, v in confs.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    return prev


def _restore(spark, prev):
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    # 95% of left rows share key 0; right side is uniform over 200 keys.
    left = spark.range(200_000).select(
        F.when(F.col("id") % 20 < 19, F.lit(0))
        .otherwise(F.col("id") % 200)
        .alias("k"),
        F.col("id").alias("v"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    )
    right = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    )

    prev = _with_confs(spark, _SKEW_CONFS)
    try:
        # NOTE: no groupBy on the join key downstream — AQE refuses to
        # split a skewed SMJ whose output partitioning a downstream
        # exchange would reuse (splitting would break co-partitioning).
        # A global aggregate has no such requirement.
        joined = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("w").alias("sw"),
            F.sum("v").alias("sv"),
        )
        adaptive_rows = sorted(map(tuple, joined.collect()))
        # The FINAL adaptive plan (post-execution) must mark the join as
        # skew-rewritten: SortMergeJoin(skew=true) / isSkew=true.
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, (
            "AQE did not rewrite the skewed sort-merge join; final plan:\n"
            + final[:2000]
        )

        # Same results with AQE off (the rewrite is performance-only).
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plain_rows = sorted(
            map(
                tuple,
                left.join(right, "k")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("w").alias("sw"),
                    F.sum("v").alias("sv"),
                )
                .collect(),
            )
        )
        assert adaptive_rows == plain_rows
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        _restore(spark, prev)
