"""The semdedup codebook-collect escape must exist IN CODE, not comments
(r9 verdict #8): above ``_SEM_CODEBOOK_MAX_BYTES`` the 2-level query must
switch to the two-pass shuffle-by-super-cell assignment, whose result is
IDENTICAL to the kernel path (same quantized-d2 routing, same tie-breaks)
while holding no driver-side structure that grows with n.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.plans import llm_ext

from .conftest import SF_CORRECT


def _result(spark, sf):
    df = llm_ext.q_embedding_semdedup_2level(spark, sf)
    return sorted(tuple(r) for r in df.collect())


def test_two_pass_matches_kernel_path(spark, monkeypatch):
    base = _result(spark, SF_CORRECT)
    assert any(r[2] for r in base), "corpus must contain planted dups"
    monkeypatch.setattr(llm_ext, "_SEM_CODEBOOK_MAX_BYTES", 0)
    assert _result(spark, SF_CORRECT) == base


def test_two_pass_plan_never_broadcasts_the_codebook(spark):
    """The whole point of the escape: the K-row codebook must be JOINED BY
    SHUFFLE, not collected or broadcast. Asserted on the assignment
    subplan directly — inside the query it sits behind a localCheckpoint,
    which truncates the executed plan of the final result. The only
    allowed broadcasts are the C-row super-centroid table's."""
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vn")
    )
    cells = llm_ext._semdedup_assign_two_pass(emb, 37, 7)
    cells.collect()  # AQE finalizes join strategies at run
    plan = cells._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "ShuffledHashJoin" in final
    # the fine join's build side must not appear as a hashed broadcast
    # (BroadcastNestedLoopJoin from the tiny super-table cross is fine)
    assert "BroadcastHashJoin" not in final


def test_two_pass_survives_empty_corpus(spark, monkeypatch, tmp_path):
    monkeypatch.setattr(llm_ext, "_SEM_CODEBOOK_MAX_BYTES", 0)
    emb = (
        spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
        .limit(0)
    )
    emb.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    df = llm_ext.q_embedding_semdedup_2level(spark, str(tmp_path))
    assert df.collect() == []
