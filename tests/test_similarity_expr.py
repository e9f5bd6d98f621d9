"""signature_col generates its hyperplane-signature expression as ONE SQL
string per band (operators/similarity.py) — these tests pin the generated
expression against an independent driver-side Python computation of the
same signature, so a literal-formatting or fold-order regression in the
string generation fails HERE, not only at the DuckDB oracle gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from real_time_flight_data_pipeline_spark.operators.similarity import (
    _hyperplane,
    signature_col,
)


def _py_signature(vec: list[float], dim: int, n_planes: int, seed: int,
                  plane_offset: int) -> int:
    """Sequential-fold reference: same order of operations as the SQL
    aggregate(zip_with(...)) tree, computed in plain Python floats."""
    sig = 0
    for p in range(n_planes):
        plane = _hyperplane(dim, plane_offset + p, seed)
        acc = 0.0
        for x, c in zip(vec, plane):
            acc += x * c
        if acc >= 0:
            sig += 1 << (n_planes - 1 - p)
    return sig


def test_signature_matches_driver_side_fold(spark):
    emb = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .limit(50)
    )
    rows = emb.collect()
    dim = len(rows[0].v)
    for n_planes, offset in [(9, 0), (16, 16), (8, 48)]:
        got = {
            r.vec_id: r.sig
            for r in emb.select(
                "vec_id",
                signature_col("v", dim, n_planes, seed=42,
                              plane_offset=offset).alias("sig"),
            ).collect()
        }
        for r in rows:
            want = _py_signature(list(r.v), dim, n_planes, 42, offset)
            assert got[r.vec_id] == want, (
                f"vec {r.vec_id} planes={n_planes} offset={offset}: "
                f"{got[r.vec_id]} != {want}"
            )


def test_signature_literals_roundtrip_exact(spark):
    """Every hyperplane component must survive the SQL literal round-trip
    bit-for-bit: parse the repr()+D literal back through Spark and compare
    to the driver float. Exercises exponent-form and full-precision
    literals across a wide plane sample."""
    comps = []
    for p in range(64):
        comps.extend(_hyperplane(16, p, seed=7))
    sql = ", ".join(f"{c!r}D" for c in comps)
    got = spark.sql(f"SELECT array({sql}) AS a").head().a
    assert list(got) == comps


def test_signature_is_long_type(spark):
    df = spark.range(1).select(
        F.expr("array(1.0D, -2.0D)").alias("v")
    ).select(signature_col("v", 2, n_planes=4).alias("sig"))
    assert df.schema["sig"].dataType.simpleString() == "bigint"
    assert 0 <= df.head().sig < 16
