"""N-round BPE training (r7 verdict #4): the round-count-parameterized
trainer held to the same bit-exact oracle bar as the 2-round catalog
queries, at 8 rounds.

* Every round's (pair, count, tokens_after) matches the composed DuckDB
  CTE chain exactly — the oracle composes round-over-round, so N-round
  training inherits the 2-round determinism proof.
* bpe_encode_frozen (the production apply path: no pair-count shuffles)
  reproduces the trainer's final corpus bit-for-bit from the frozen
  merge list alone — the train/apply separation a deployed tokenizer
  depends on.
* Token totals decrease monotonically round-over-round (each applied
  merge strictly shrinks the stream while any pair repeats).

Cost-per-round at sf0.1 is measured by scripts/bpe_round_curve.py (flat
marginal cost; numbers in COVERAGE.md), not here — pytest stays sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.functions import text as TX
from real_time_flight_data_pipeline_spark.plans.llm_ext import (
    _bpe_oracle_rounds,
    bpe_encode_frozen,
    bpe_train,
)
from real_time_flight_data_pipeline_spark.plans.northstar import _SQL_TOKS
from real_time_flight_data_pipeline_spark.sources.parquet import load_table

from .conftest import SF_SMOKE

_N = 8


@pytest.fixture(autouse=True)
def _few_shuffle_partitions(spark):
    """8 driver-synchronous rounds x several window stages over ~100 docs:
    at the session's 32 shuffle partitions the test is pure task-launch
    overhead (196 s); 4 partitions keeps the same plans at ~1/4 the wall
    time. Restored after each test."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_eight_round_training_matches_composed_oracle(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    toks0 = docs.select(
        "doc_id", TX.tokens(F.col("text")).alias("toks")
    ).localCheckpoint(eager=False)
    outs, tops = bpe_train(toks0, _N)

    got = []
    for rnd, (out, top) in enumerate(zip(outs, tops), start=1):
        t = top.collect()[0]
        after = out.agg(F.sum(F.size("toks"))).head()[0]
        got.append((rnd, t.l, t.r, t.cnt, after))

    selects = " UNION ALL ".join(
        f"SELECT {r} AS round, t.l, t.r, t.cnt, "
        f"(SELECT CAST(SUM(len(toks)) AS BIGINT) FROM out_{r}) AS after "
        f"FROM top_{r} t"
        for r in range(1, _N + 1)
    )
    sql = f"""
    WITH toks0 AS MATERIALIZED (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    {_bpe_oracle_rounds(_N)}
    SELECT * FROM ({selects}) ORDER BY round
    """
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == want, f"\ngot:  {got}\nwant: {want}"

    # monotone token-count decrease while merges keep firing
    afters = [g[4] for g in got]
    assert all(a >= b for a, b in zip(afters, afters[1:])), afters
    assert afters[-1] < afters[0]


def test_frozen_merge_encode_reproduces_training_state(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    toks0 = docs.select(
        "doc_id", TX.tokens(F.col("text")).alias("toks")
    ).localCheckpoint(eager=False)
    outs, tops = bpe_train(toks0, _N)
    frozen = [
        t.select("l", "r").localCheckpoint(eager=True) for t in tops
    ]  # merges.txt: pairs only, counts not needed to encode
    encoded = bpe_encode_frozen(toks0, frozen)
    sig = lambda df: sorted(
        (r.doc_id, " ".join(r.toks)) for r in df.collect()
    )
    assert sig(encoded) == sig(outs[-1])
