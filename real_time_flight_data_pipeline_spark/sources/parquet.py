"""Parquet table loaders for the driver testdata layout.

One parquet file per table under ``{sf_dir}/{name}.parquet``. Columnar scans
with pushdown/pruning come for free; callers should still select only the
columns they need so ``ReadSchema`` stays narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

# Columns written as parquet TIMESTAMP(NANOS). Depending on the Spark
# runtime they arrive either as epoch-nanos longs (<=3.x with
# spark.sql.legacy.parquet.nanosAsLong) or as TIMESTAMP_NTZ (4.x, where that
# conf is accepted but ignored). Both branches normalize to a zoned
# TIMESTAMP truncated to micros, exactly like DuckDB's TIMESTAMP_NS ->
# TIMESTAMP read, keeping both engines bit-identical:
#   bigint         -> integer `div 1000` (float division would lose
#                     precision above 2^53 ns) + timestamp_micros
#   timestamp_ntz  -> to_utc_timestamp(_, "UTC") (session TZ is UTC, so the
#                     wall-clock instant is unchanged; only the type flips)
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _ensure_runtime_confs(spark: SparkSession) -> None:
    """Make a caller-provided SparkSession (e.g. the verification driver's)
    safe for this engine: nanos-typed parquet readable, UTC session clock.
    Both are runtime-settable SQL confs."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down (e.g. Spark Connect policy) — reads may still work


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    _ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in _NANOS_TS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.to_utc_timestamp(F.col(c), "UTC"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    wanted = names or TESTDATA_TABLES
    return {n: load_table(spark, sf_dir, n) for n in wanted}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view for the SQL API."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
