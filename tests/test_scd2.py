"""Invariants of the SCD2 gaps-and-islands build (user_state_scd2):
value-level correctness is oracle-proven in test_oracle.py; these pin the
STRUCTURAL contract downstream consumers rely on — intervals per user are
disjoint, contiguous, cover every event, and version numbers are dense."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.plans.relational_ext import (
    user_state_scd2_from,
)

SF = "/root/testdata/sf0.001"


def _scd(spark):
    from real_time_flight_data_pipeline_spark.sources.parquet import load_table

    ev = load_table(spark, SF, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return ev, user_state_scd2_from(ev)


def test_intervals_contiguous_and_versions_dense(spark):
    ev, scd = _scd(spark)
    rows = scd.orderBy("user_id", "version").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, ivs in by_user.items():
        # versions dense from 1; exactly one open (current) interval, last.
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
        assert [r.is_current for r in ivs] == [False] * (len(ivs) - 1) + [True]
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev.valid_to == nxt.valid_from  # contiguous, half-open
            assert prev.valid_from < prev.valid_to  # non-empty
        # adjacent islands must differ in state (else they'd be one island)
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev.state != nxt.state


def test_event_counts_and_coverage(spark):
    ev, scd = _scd(spark)
    # n_events sums back to the fact count per user.
    got = {
        r.user_id: r.total
        for r in scd.groupBy("user_id")
        .agg(F.sum("n_events").alias("total"))
        .collect()
    }
    want = {
        r.user_id: r.total
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("total"))
        .collect()
    }
    assert got == want
    # every event's ts falls inside its user's covering interval span
    span = {
        r.user_id: (r.lo, r.hi)
        for r in scd.groupBy("user_id")
        .agg(F.min("valid_from").alias("lo"), F.max("valid_from").alias("hi"))
        .collect()
    }
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in ev.groupBy("user_id")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()
    }
    for u, (lo, hi) in bounds.items():
        assert span[u][0] == lo  # first interval opens at first event
        assert span[u][1] <= hi  # last interval opens at/before last event
