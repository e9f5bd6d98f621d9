"""Misra-Gries sketch: the guarantees the heavy-hitter query leans on.

The catalog query (docs_token_heavy_hitters) runs on a 31-word synthetic
vocab where the sketch never prunes; these tests exercise the pruning path
the 100 TB story depends on — capacity far below the distinct count — on a
crafted Zipf corpus, plus the chunk-boundary behavior of the partition-wide
counter dict.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.operators.sketch import (
    misra_gries_candidates,
)


def _zipf_stream(vocab: int, n: int) -> list[str]:
    """Deterministic Zipf-ish stream: item i appears ~ n/(i+1) times,
    interleaved (not sorted) so partition slices see mixed items."""
    out: list[str] = []
    i = 0
    while len(out) < n:
        rank = i % vocab
        # item `rank` emitted every (rank+1)-th opportunity -> 1/(rank+1) rate
        if i % (rank + 1) == 0:
            out.append(f"w{rank}")
        i += 1
    return out[:n]


def test_superset_guarantee_under_pruning(spark):
    """capacity << vocab: every item with freq > N/(capacity+1) must appear
    in the candidate set, and the recount+threshold output must equal the
    brute-force answer."""
    stream = _zipf_stream(vocab=500, n=20_000)
    truth = Counter(stream)
    n = len(stream)
    capacity = 16
    df = spark.createDataFrame(
        [(w,) for w in stream], "token string"
    ).repartition(8)

    cands = {
        r["token"]
        for r in misra_gries_candidates(df, "token", capacity).collect()
    }
    assert len(cands) <= 8 * capacity  # bounded summaries actually pruned
    assert len(cands) < len(truth)  # pruning really happened (vocab 500)

    must_survive = {w for w, c in truth.items() if c * (capacity + 1) > n}
    assert must_survive, "test corpus must contain true heavy hitters"
    missing = must_survive - cands
    assert not missing, f"superset guarantee violated: {missing}"

    # exact recount over candidates == brute force at threshold phi=1/17
    exact = {w: c for w, c in truth.items() if c * 17 > n}
    recount = {w: truth[w] for w in cands if truth[w] * 17 > n}
    assert recount == exact


def test_counters_span_arrow_chunks(spark):
    """An item whose occurrences are split across Arrow chunks must be
    counted across ALL chunks of the partition (the dict lives outside the
    chunk loop). With tiny maxRecordsPerBatch, per-chunk islands would
    undercount 'hot' below the prune threshold and drop it."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        # 1 partition: 400 distinct cold items + 'hot' every 5th row.
        rows = []
        for i in range(2000):
            rows.append(("hot",) if i % 5 == 0 else (f"cold{i}",))
        df = spark.createDataFrame(rows, "token string").coalesce(1)
        out = misra_gries_candidates(df, "token", 8).collect()
        got = {r["token"]: r["lower_bound"] for r in out}
        assert "hot" in got
        assert got["hot"] > 0
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_no_prune_below_capacity(spark):
    """distinct <= capacity: summaries are exact partition counts."""
    rows = [(w,) for w in ["a"] * 10 + ["b"] * 5 + ["c"] * 1]
    df = spark.createDataFrame(rows, "token string").coalesce(1)
    out = misra_gries_candidates(df, "token", 8).collect()
    assert {r["token"]: r["lower_bound"] for r in out} == {
        "a": 10,
        "b": 5,
        "c": 1,
    }
