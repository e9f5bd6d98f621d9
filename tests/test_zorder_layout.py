"""Z-order layout: multi-column row-group pruning, measured from footers.

Extends tests/test_sorted_layout_pruning.py to the two-predicate case.
A linear sort on user_id gives each row group a narrow user_id slice but
the FULL month of timestamps — a day predicate overlaps (almost) every
group. Z-ordering (user_id, day) bounds each group in BOTH dimensions,
so both predicate classes skip a real fraction of row groups. Asserted
engine-independently from parquet footer statistics, exactly like the
single-column test; plus a correctness identity (layout must never
change results) and a pure-Python check that the Morton key is the
mathematical bit interleave.
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.operators.layout import (
    bucketize,
    zorder_key,
)
from real_time_flight_data_pipeline_spark.sources.parquet import load_table

from .conftest import SF_CORRECT

_ROW_GROUP_BYTES = 48 * 1024
_BITS = 8


def _overlap_fraction(path: str, column: str, lo, hi) -> tuple[int, int]:
    """(row groups whose [min,max] for `column` overlaps [lo, hi], total)."""
    match = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        }[column]
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(idx).statistics
            total += 1
            mn, mx = st.min, st.max
            if isinstance(mn, dt.datetime):
                mn, mx = mn.replace(tzinfo=None), mx.replace(tzinfo=None)
            if mn <= hi and lo <= mx:
                match += 1
    return match, total


def _write(df, path):
    df.repartition(1).write.mode("overwrite").parquet(path)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF_CORRECT, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    zkey = zorder_key(
        [
            bucketize(F.col("user_id"), 0, 150, _BITS),
            bucketize(
                F.unix_timestamp("ts"),
                dt.datetime(2024, 1, 1).timestamp(),
                dt.datetime(2024, 1, 31).timestamp(),
                _BITS,
            ),
        ],
        bits=_BITS,
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev = hconf.get("parquet.block.size", None)
    hconf.set("parquet.block.size", str(_ROW_GROUP_BYTES))
    # Spark's default INT96 timestamp encoding carries NO min/max
    # statistics — a timestamp column can never prune under it. Writing
    # TIMESTAMP_MICROS is a precondition for any time-range skipping;
    # at 100 TB this single conf is the difference between scanning a
    # day and scanning a decade.
    prev_tst = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        linear_dir = str(tmp_path / "linear")
        z_dir = str(tmp_path / "zorder")
        _write(ev.sortWithinPartitions("user_id"), linear_dir)
        _write(
            ev.withColumn("z", zkey)
            .sortWithinPartitions("z")
            .drop("z"),
            z_dir,
        )
    finally:
        if prev is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", prev)
        if prev_tst is None:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        else:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev_tst)

    day_lo = dt.datetime(2024, 1, 10)
    day_hi = dt.datetime(2024, 1, 11)

    # Linear layout: great on user_id, useless on a day range.
    lin_user, lin_total = _overlap_fraction(linear_dir, "user_id", 42, 42)
    lin_day, _ = _overlap_fraction(linear_dir, "ts", day_lo, day_hi)
    assert lin_total >= 8, "row groups too coarse for a meaningful test"
    assert lin_user / lin_total <= 0.25
    assert lin_day / lin_total >= 0.9  # every user spans the whole month

    # Z-order: BOTH predicates skip a real fraction of row groups.
    z_user, z_total = _overlap_fraction(z_dir, "user_id", 42, 42)
    z_day, _ = _overlap_fraction(z_dir, "ts", day_lo, day_hi)
    assert z_total >= 8
    assert z_user / z_total <= 0.6, "z-order lost user pruning entirely"
    assert z_day / z_total <= 0.6, "z-order gained no day pruning"
    # and the day predicate must prune strictly better than linear layout
    assert z_day / z_total < lin_day / lin_total

    # Layout is performance, not semantics: identical result sets.
    lin = spark.read.parquet(linear_dir).filter(F.col("user_id") == 42)
    zz = spark.read.parquet(z_dir).filter(F.col("user_id") == 42)
    assert sorted(map(tuple, lin.collect())) == sorted(map(tuple, zz.collect()))


def test_zorder_key_is_bit_interleave(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 255) for b in (0, 3, 128, 255)],
        "a long, b long",
    )
    rows = df.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], bits=8).alias("z")
    ).collect()

    def morton(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert r.z == morton(r.a, r.b), (r.a, r.b, r.z)


def test_bucketize_clamps_and_spans(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (400.0,)], "x double")
    got = [
        r.b
        for r in df.select(
            bucketize(F.col("x"), 0, 100, 4).alias("b")
        ).collect()
    ]
    assert got[0] == 0  # below range clamps low
    assert got[1] == 0
    assert got[2] == 8  # midpoint of 16 buckets
    assert got[4] == 15  # above range clamps high
    assert all(0 <= b <= 15 for b in got)
