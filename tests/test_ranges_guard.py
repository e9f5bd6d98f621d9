"""Input-hygiene guards on grid_range_join (ADVICE r2): reserved-column
collision raises; inverted ranges are dropped before the cell explode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_flight_data_pipeline_spark.operators.ranges import grid_range_join


def _vals(spark):
    return spark.range(0, 20).select(F.col("id").cast("double").alias("val"))


def test_reserved_cell_column_raises(spark):
    vals = _vals(spark)
    ranges = spark.createDataFrame([(0.0, 5.0, 1)], "lo double, hi double, _cell int")
    with pytest.raises(ValueError, match="_cell"):
        grid_range_join(vals, ranges, "val", "lo", "hi", grid=5.0)
    with pytest.raises(ValueError, match="_cell"):
        grid_range_join(vals.withColumn("_cell", F.lit(1)), ranges.drop("_cell"),
                        "val", "lo", "hi", grid=5.0)


def test_inverted_ranges_dropped(spark):
    vals = _vals(spark)
    ranges = spark.createDataFrame(
        [(0.0, 5.0, "ok"), (15.0, 3.0, "inverted")], "lo double, hi double, tag string"
    )
    out = grid_range_join(vals, ranges, "val", "lo", "hi", grid=4.0).collect()
    assert {r.tag for r in out} == {"ok"}
    assert sorted(r.val for r in out) == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_grid_range_join_matches_naive_on_random_inputs(spark):
    """Randomized equivalence: grid-blocked join == naive theta-join filter
    across grids, signs, cell-boundary values and degenerate ranges."""
    import random

    rng = random.Random(7)
    for grid in (0.5, 1.0, 3.0, 10.0):
        vals = [round(rng.uniform(-30, 30), 2) for _ in range(60)] + [
            0.0, -grid, grid, 2 * grid  # exact cell boundaries
        ]
        ranges = [
            tuple(sorted((round(rng.uniform(-30, 30), 2),
                          round(rng.uniform(-30, 30), 2))))
            for _ in range(15)
        ] + [(5.0, 5.0)]  # empty half-open range
        vdf = spark.createDataFrame([(v,) for v in vals], "val double")
        rdf = spark.createDataFrame(
            [(lo, hi, i) for i, (lo, hi) in enumerate(ranges)],
            "lo double, hi double, rid int",
        )
        got = sorted(
            (r.val, r.rid)
            for r in grid_range_join(vdf, rdf, "val", "lo", "hi", grid=grid).collect()
        )
        want = sorted(
            (v, i)
            for v in vals
            for i, (lo, hi) in enumerate(ranges)
            if lo <= v < hi
        )
        assert got == want, f"grid={grid}"
