"""Runtime bloom-filter join pruning: the shuffle-reduction path for
selective fact-fact joins.

When one join side carries a selective filter, Spark can build a bloom
filter over its join keys at runtime and push a might_contain() predicate
into the OTHER side's scan — rows that cannot match are dropped BEFORE the
shuffle. At 100 TB this turns "shuffle the whole fact table to probe a 1%
slice" into "shuffle ~1% (plus false positives)". The feature is
threshold-gated on statistics (creation side below
creationSideThreshold, application side above
applicationSideScanSizeThreshold); local test parquet is far below the
production defaults, so the test lowers the gates to prove the MECHANISM —
plan shape and result equality — the same way the AQE skew tests do.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.sources.parquet import load_table

from .conftest import SF_CORRECT

_CONFS = {
    # production-shaped gates don't trigger on KB-scale local parquet
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join shape
}


def test_bloom_filter_prunes_application_side(spark):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    prev = {k: spark.conf.get(k) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF_CORRECT, "lineitem")
        urgent = load_table(spark, SF_CORRECT, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(urgent, li.l_orderkey == urgent.o_orderkey)

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, (
            "no runtime bloom filter injected:\n" + plan
        )
        assert "bloom_filter_agg" in plan

        n_bloom = joined.count()

        # same join with the feature off: identical result
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        try:
            joined_plain = li.join(urgent, li.l_orderkey == urgent.o_orderkey)
            assert "might_contain" not in (
                joined_plain._jdf.queryExecution().executedPlan().toString()
            )
            assert n_bloom == joined_plain.count() > 0
        finally:
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
            )
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
