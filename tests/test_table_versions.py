"""ParquetTable retention/time-travel/compaction: the Delta-property subset
the offline container can't install, emulated and verified on plain parquet
(commit log + atomic pointer flip + bounded vacuum)."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from real_time_flight_data_pipeline_spark.streaming.pipeline import ParquetTable

_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _df(spark, tag: str, n: int):
    return spark.createDataFrame([(i, f"{tag}{i}") for i in range(n)], _SCHEMA)


def test_time_travel_and_bounded_retention(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), _SCHEMA, keep_versions=3)
    for i, tag in enumerate(["a", "b", "c", "d"]):
        t.overwrite(_df(spark, tag, 5 + i))

    vs = t.versions()
    assert len(vs) == 3  # 4 commits, retention 3: oldest vacuumed
    # newest version is what read() serves
    assert t.read().count() == 8
    assert {r["v"] for r in t.read().collect()} == {f"d{i}" for i in range(8)}
    # time travel to the oldest retained commit
    old = t.read(version=vs[0])
    assert {r["v"] for r in old.collect()} == {f"b{i}" for i in range(6)}
    # vacuumed versions are refused, not silently empty
    import pytest

    with pytest.raises(ValueError, match="not in retained history"):
        t.read(version="v_000000000000")


def test_compaction_preserves_contents_and_bounds_files(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), _SCHEMA, keep_versions=2)
    t.overwrite(_df(spark, "x", 100).repartition(16))
    cur = os.path.join(t.path, t._current_version())
    n_before = len([f for f in os.listdir(cur) if f.endswith(".parquet")])
    assert n_before >= 8  # genuinely fragmented before compaction

    before = sorted((r["k"], r["v"]) for r in t.read().collect())
    t.compact(target_files=2)
    cur = os.path.join(t.path, t._current_version())
    n_after = len([f for f in os.listdir(cur) if f.endswith(".parquet")])
    assert n_after <= 2
    assert sorted((r["k"], r["v"]) for r in t.read().collect()) == before
