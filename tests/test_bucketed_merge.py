"""Bucketed fact merge (r7 verdict #6): the M4 merge's target side must
not shuffle when the fact is stored bucketed by the merge key.

test_bucketing.py proves zero-Exchange SMJ on two bucketed tables; this
wires the property into the MERGE path itself: BucketedParquetTable
writes each version bucketed+sorted by flight_key through the catalog,
and merge_upsert(null_safe_keys=False) joins with plain equality so the
bucketed layout satisfies the join's required distribution. Asserted on
the EXECUTED plan: the only Exchange hashes the micro-batch (source)
side's attribute; the target scan reads "Bucketed: true" straight into
the merge sort. At 100 TB this is the difference between re-shuffling
the whole fact every micro-batch and shuffling only the batch.

Also pins WHY null_safe_keys exists: `<=>` keys plan as coalesce-wrapped
hash keys, which do not line up with the bucket layout — the same merge
with null-safe keys loses the bucketed scan entirely.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_flight_data_pipeline_spark.operators.merge import (
    MergePolicy,
    merge_upsert,
)
from real_time_flight_data_pipeline_spark.streaming.pipeline import (
    BucketedParquetTable,
    ParquetTable,
)

_SCHEMA = T.StructType(
    [
        T.StructField("flight_key", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _frames(spark):
    init = spark.range(2000).select(
        F.concat(F.lit("K"), F.col("id")).alias("flight_key"),
        F.col("id").alias("v"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
    )
    src = spark.range(500, 2500).select(
        F.concat(F.lit("K"), F.col("id")).alias("flight_key"),
        (F.col("id") * 10).alias("v"),
        F.timestamp_seconds(F.lit(1_700_500_000) + F.col("id")).alias("ts"),
    )
    return init, src


def _merge(target, src):
    return merge_upsert(
        target,
        src,
        keys=["flight_key"],
        policies={"ts": MergePolicy.GREATEST},
        null_safe_keys=False,
    )


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _assert_target_side_never_exchanged(plan: str) -> None:
    """Every Exchange must hash the SOURCE attribute; the target's
    attribute id (taken from the bucketed scan line) must appear in none.
    Attribute ids are dynamic, so parse them from the executed plan."""
    scan_ids = {
        m.group(1)
        for m in re.finditer(r"FileScan[^\n]*?flight_key#(\d+)[^\n]*Bucketed: true", plan)
    }
    assert scan_ids, f"no bucketed target scan in plan:\n{plan}"
    exch_ids = {
        m.group(1)
        for m in re.finditer(r"Exchange hashpartitioning\(flight_key#(\d+)", plan)
    }
    assert exch_ids, "expected the source-side Exchange to remain"
    assert not (scan_ids & exch_ids), (
        f"target-side Exchange present (ids {scan_ids & exch_ids}):\n{plan}"
    )


def test_bucketed_merge_shuffles_only_the_batch(spark, tmp_path, no_broadcast):
    init, src = _frames(spark)
    tbl = BucketedParquetTable(
        spark, str(tmp_path / "fact"), _SCHEMA, bucket_key="flight_key", n_buckets=8
    )
    tbl.overwrite(init)

    merged = _merge(tbl.read(), src)
    rows = sorted(map(tuple, merged.collect()))
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    _assert_target_side_never_exchanged(plan)

    # Value parity with the plain (unbucketed, null-safe) merge path.
    plain = ParquetTable(spark, str(tmp_path / "plainfact"), _SCHEMA)
    plain.overwrite(init)
    want = sorted(
        map(
            tuple,
            merge_upsert(
                plain.read(), src, ["flight_key"], {"ts": MergePolicy.GREATEST}
            ).collect(),
        )
    )
    assert rows == want
    assert len(rows) == 2500

    # The layout survives the commit round-trip: write the merge result
    # back, and the NEXT merge's target side is again exchange-free.
    tbl.overwrite(merged)
    again = _merge(tbl.read(), src)
    again.collect()
    _assert_target_side_never_exchanged(
        again._jdf.queryExecution().executedPlan().toString()
    )
    assert sorted(map(tuple, tbl.read().collect())) == want


def test_null_safe_keys_lose_the_bucketed_layout(spark, tmp_path, no_broadcast):
    """The reason null_safe_keys exists: `<=>` merge keys plan as
    coalesce-wrapped hashes, so the same bucketed target re-shuffles."""
    init, src = _frames(spark)
    tbl = BucketedParquetTable(
        spark, str(tmp_path / "fact"), _SCHEMA, bucket_key="flight_key", n_buckets=8
    )
    tbl.overwrite(init)
    m = merge_upsert(
        tbl.read(), src, ["flight_key"], {"ts": MergePolicy.GREATEST},
        null_safe_keys=True,
    )
    m.collect()
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" not in plan  # layout unusable under <=>


def test_bucketed_table_versioning_contract(spark, tmp_path):
    """BucketedParquetTable keeps ParquetTable's commit semantics: pointer
    flip, time travel within retention, vacuum of catalog entries+dirs,
    and a fresh catalog re-registration path (a new session would hit it;
    simulated by dropping the catalog entry before read)."""
    init, src = _frames(spark)
    tbl = BucketedParquetTable(
        spark, str(tmp_path / "fact"), _SCHEMA, bucket_key="flight_key",
        n_buckets=4, keep_versions=2,
    )
    tbl.overwrite(init.limit(100))
    v1 = tbl.versions()[-1]
    tbl.overwrite(init.limit(200))
    assert tbl.read().count() == 200
    assert tbl.read(version=v1).count() == 100  # time travel
    tbl.overwrite(init.limit(300))
    assert v1 not in tbl.versions()  # vacuumed beyond retention
    assert not spark.catalog.tableExists(tbl._table_for(v1))
    # catalog re-registration (new-session path)
    cur = tbl.versions()[-1]
    spark.sql(f"DROP TABLE IF EXISTS {tbl._table_for(cur)}")
    assert tbl.read().count() == 300
    # and the re-registered DDL table still plans bucketed
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        m = _merge(tbl.read(), src)
        m.collect()
        _assert_target_side_never_exchanged(
            m._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        # restore the SAVED value — session.py configures 64 MB, and a
        # hardcoded Spark default here would leak a 10 MB threshold into
        # every later plan-asserting test in the shared session.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
