"""Stride-schedule properties of docs_training_order.

Three gates beyond the DuckDB oracle replica:

1. The two-phase distributed enumeration (range partition + mid offsets)
   equals the naive per-language window rank — on a corpus forced through
   MANY partitions so the offset arithmetic actually crosses boundaries.
2. Stride adherence: per-language counts in the emitted head are bracketed
   by the closed-form stride bounds — the property the schedule exists for
   (each language appears at its mix-weight rate in every prefix).
3. Plan shape: the head is TakeOrderedAndProject over a rangepartitioning
   Exchange; no corpus-wide single-partition window Exchange exists.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
from real_time_flight_data_pipeline_spark.plans.llm_ext import (
    _ORDER_FX,
    _ORDER_HEAD,
)
from real_time_flight_data_pipeline_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _result(spark):
    return REGISTRY["docs_training_order"].builder(spark, SF_SMOKE)


def test_two_phase_rank_equals_window_rank(spark):
    """The distributed enumeration must reproduce the per-language
    row_number exactly even when (lang, pid) groups span many partitions
    (32 range partitions over 500 docs => ~16 rows per partition, every
    language crosses dozens of boundaries)."""
    got = {r["doc_id"]: r["lang_rank"] for r in _result(spark).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    tie = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("order:"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    naive = docs.select(
        "doc_id",
        F.row_number()
        .over(Window.partitionBy("lang").orderBy(tie, "doc_id"))
        .cast("long")
        .alias("lang_rank"),
    )
    want = {r["doc_id"]: r["lang_rank"] for r in naive.collect()}
    assert got  # head is non-empty
    for doc_id, rank in got.items():
        assert rank == want[doc_id], (doc_id, rank, want[doc_id])


def test_stride_adherence(spark):
    """For the head's cut value V, language L must contribute between
    floor(((V-1)/inv_w + 1)/2) and floor((V/inv_w + 1)/2) docs (capped by
    n_L) — the defining property of stride scheduling: counts in any
    prefix are within one slot of weight-proportional."""
    rows = _result(spark).collect()
    assert len(rows) == min(_ORDER_HEAD, 500)
    cut = max(r["vkey"] for r in rows)
    inv_w = {}  # recover each language's stride from its rows
    for r in rows:
        inv_w[r["lang"]] = r["vkey"] // (2 * r["lang_rank"] - 1)
    n_by_lang = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    counts = {}
    for r in rows:
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    for lang, c in counts.items():
        lo = min(n_by_lang[lang], int(((cut - 1) // inv_w[lang] + 1) // 2))
        hi = min(n_by_lang[lang], int((cut // inv_w[lang] + 1) // 2))
        assert lo <= c <= hi + 1, (lang, c, lo, hi)
    # sanity: the recovered strides are in the fixed-point ballpark of
    # weights in [1/MIX_CAP-ish, MIX_CAP] => FX/5 <= inv_w <= 5*FX-ish
    for lang, iw in inv_w.items():
        assert _ORDER_FX / 10 <= iw <= _ORDER_FX * 10, (lang, iw)


def test_plan_is_barriered_topk_no_corpus_exchange(spark):
    """Head = TakeOrderedAndProject; the range-partitioned enumeration is
    materialized by the checkpoint barrier (Scan ExistingRDD), and NO
    Exchange downstream of it ever shuffles corpus-row columns — the
    offsets/weights joins are broadcasts, so the corpus is shuffled exactly
    once (inside the barrier). Corpus-row columns (doc_id/tie/mid) appear
    in an Exchange's partitioning only if the corpus itself re-shuffles."""
    import re

    plan = _result(spark)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Scan ExistingRDD") == 2  # barrier feeds grp + rank
    for m in re.finditer(r"Exchange (?:hash|range)partitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        assert not re.search(r"\b(doc_id|tie|mid)#", keys), (
            "corpus re-shuffled after the barrier: " + m.group(0)
        )


def test_no_per_language_window_exchange(spark):
    """No Window node may run over the raw corpus partitioned by lang
    alone; the only Window allowed is the offsets cumsum over the bounded
    (lang, pid) count table (input is an aggregate)."""
    plan = _result(spark)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            # offsets window partitions by lang ONLY over the aggregated
            # (lang, pid) count table — its child must be a HashAggregate,
            # which in the plan string appears as the window running over
            # sum(c): accept only the known shape.
            assert "sum(c#" in line or "sum(cast(c#" in line, line
