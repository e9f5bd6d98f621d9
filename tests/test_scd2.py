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


# ---------------------------------------------------------------------------
# Incremental SCD2 maintenance (operators/scd2.py) vs the batch rebuild.
# ---------------------------------------------------------------------------
from pyspark.sql import Window

from real_time_flight_data_pipeline_spark.operators.scd2 import scd2_apply


def _fold_batches(spark, ev):
    """Feed each user's events one at a time (nth-event batches), folding
    through scd2_apply; with one observation per key per batch this must
    reproduce the rebuild exactly."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w)).cache()
    n_max = ranked.agg(F.max("rn")).collect()[0][0]
    state = spark.createDataFrame(
        [], "user_id long, version int, state string, valid_from timestamp, valid_to timestamp"
    )
    for i in range(1, n_max + 1):
        batch = ranked.filter(F.col("rn") == i).select(
            "user_id", F.col("event_type").alias("state"), "ts"
        )
        state = scd2_apply(state, batch).localCheckpoint(eager=True)
    return state


def test_incremental_apply_matches_rebuild(spark):
    from real_time_flight_data_pipeline_spark.sources.parquet import load_table

    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("user_id") < 6)
        .select("user_id", "event_type", "ts", "event_id")
    )
    # bound the fold depth: first 8 events per user
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 8).drop("rn")

    got = _fold_batches(spark, ev)
    want = user_state_scd2_from(ev).select(
        "user_id", "version", "state", "valid_from", "valid_to"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_apply_is_idempotent_and_ignores_stale(spark):
    import datetime as dt

    state = spark.createDataFrame(
        [], "user_id long, version int, state string, valid_from timestamp, valid_to timestamp"
    )
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 2)
    b = lambda rows: spark.createDataFrame(rows, "user_id long, state string, ts timestamp")

    s1 = scd2_apply(state, b([(1, "view", t0)]))
    assert [(r.version, r.state, r.valid_to) for r in s1.collect()] == [(1, "view", None)]
    # same observation replayed: no-op
    s2 = scd2_apply(s1, b([(1, "view", t1)]))
    assert sorted(map(tuple, s2.collect())) == sorted(map(tuple, s1.collect()))
    # stale (out-of-order) different state: ignored
    s3 = scd2_apply(s1, b([(1, "click", t0)]))
    assert sorted(map(tuple, s3.collect())) == sorted(map(tuple, s1.collect()))
    # real transition: closes and versions
    s4 = scd2_apply(s1, b([(1, "click", t1)]))
    rows = {r.version: r for r in s4.collect()}
    assert rows[1].valid_to == t1 and rows[2].state == "click" and rows[2].valid_to is None


def test_apply_closed_only_key_continues_versions(spark):
    """A key whose open row was externally removed (only closed rows
    remain) must continue numbering from its max closed version, not
    restart at 1 and collide with existing history (ADVICE r7)."""
    import datetime as dt

    t = lambda d: dt.datetime(2024, 1, d)
    state = spark.createDataFrame(
        [
            (1, 1, "view", t(1), t(2)),
            (1, 2, "click", t(2), t(3)),  # closed — no open row for key 1
            (2, 1, "view", t(1), None),  # untouched key with open row
        ],
        "user_id long, version int, state string, valid_from timestamp, valid_to timestamp",
    )
    batch = spark.createDataFrame(
        [(1, "purchase", t(5)), (1, "view", t(6))],
        "user_id long, state string, ts timestamp",
    )
    out = scd2_apply(state, batch)
    k1 = sorted(
        ((r.version, r.state, r.valid_from, r.valid_to)
         for r in out.collect() if r.user_id == 1)
    )
    assert k1 == [
        (1, "view", t(1), t(2)),
        (2, "click", t(2), t(3)),
        (3, "purchase", t(5), t(6)),
        (4, "view", t(6), None),
    ], k1
    k2 = [(r.version, r.valid_to) for r in out.collect() if r.user_id == 2]
    assert k2 == [(1, None)]
