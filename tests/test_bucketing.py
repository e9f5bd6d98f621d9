"""Bucketed co-located join: the shuffle-elimination path for repeated big
joins on a stable key (SURVEY.md brief: 'bucketing for co-located joins').

Writing both sides bucketed on the join key lets Spark plan the join with
ZERO Exchange operators — at 100 TB this turns every fact-fact join on the
bucket key into a local merge per bucket. The test proves the property on
the physical plan, not by assertion of intent.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def test_bucketed_join_plans_no_exchange(spark):
    # spark.sql.warehouse.dir is static per session; managed tables land in
    # the session default and are dropped (files included) in the finally.
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"ev_bucketed_{suffix}", f"cust_bucketed_{suffix}"

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    cust = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    (ev.write.bucketBy(8, "user_id").sortBy("user_id").format("parquet")
       .mode("overwrite").saveAsTable(ta))
    (cust.write.bucketBy(8, "user_id").sortBy("user_id").format("parquet")
       .mode("overwrite").saveAsTable(tb))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ta).join(spark.table(tb), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed-by-key join must not shuffle:\n" + plan
        )
        # and it still computes the right thing
        n_bucketed = joined.count()
        n_plain = ev.join(cust, "user_id").count()
        assert n_bucketed == n_plain > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")
