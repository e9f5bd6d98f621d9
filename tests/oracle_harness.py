"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query in Spark and its oracle SQL in DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive canonical value multiset. Strictness matches (or exceeds)
the driver's hash comparison: values are canonicalized to strings with exact
repr, so a pass here implies a hash match there.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from real_time_flight_data_pipeline_spark.schemas import TESTDATA_TABLES


def _canon(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        # Deliberately NOT coerced to float: a DECIMAL-typed oracle column
        # must be caught here (the driver may hash it differently).
        return f"decimal:{v}"
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


_CONN_CACHE: dict[str, duckdb.DuckDBPyConnection] = {}


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """One shared connection per SF dir (views registered once): the full
    46-oracle gate reconnecting per compare measurably slows the suite."""
    con = _CONN_CACHE.get(sf_dir)
    if con is None:
        con = duckdb.connect()
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        _CONN_CACHE[sf_dir] = con
    return con


# DuckDB output types whose Python values look identical to safe types but
# hash differently in the driver's type-sensitive comparison. HUGEINT comes
# from uncast sum(int) (plain and windowed); DECIMAL from numeric literals
# like 0.25. r1 proved these slip through value-level comparison: the three
# CORRECTNESS_r01 hash failures were exactly the three uncast-sum oracles.
_BANNED_DUCKDB_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def _nested_problem(colname: str, type_str: str, side: str) -> str:
    return (
        f"{side} column '{colname}' has nested type {type_str}: the driver's "
        f"comparator pandas-factorizes output cells and list/struct/map values "
        f"are unhashable (CORRECTNESS_r02 multimodal_resize err) — serialize "
        f"to a scalar (array_join/concat_ws) or explode before returning"
    )


def _check_oracle_types(rel) -> list[str]:
    problems = []
    for name, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(b in t for b in _BANNED_DUCKDB_TYPES):
            problems.append(
                f"oracle column '{name}' has driver-unsafe DuckDB type {t}: "
                f"CAST it (e.g. AS BIGINT / AS DOUBLE) in the oracle SQL"
            )
        if "[]" in t or t.startswith(("LIST", "STRUCT", "MAP")):
            problems.append(_nested_problem(name, t, "oracle"))
    return problems


def check_spark_output_types(schema) -> list[str]:
    """Spark-side twin of _check_oracle_types: the failing column can be
    produced by mapInPandas (never seen by DuckDB), so the Spark schema of
    every driver-checked query must also be free of nested types."""
    from pyspark.sql import types as T

    problems = []
    for f in schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            problems.append(_nested_problem(f.name, f.dataType.simpleString(), "spark"))
    return problems


def compare(spark, sf_dir: str, builder, oracle: str) -> tuple[bool, str]:
    sdf = builder(spark, sf_dir)
    s_rows = sdf.collect()
    s_cols = sdf.columns

    con = duckdb_conn(sf_dir)
    problems = check_spark_output_types(sdf.schema)
    problems += _check_oracle_types(con.sql(oracle))
    res = con.execute(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount mismatch: spark={len(s_rows)} duckdb={len(d_rows)}")
    if not problems:
        ms, md = _rows_to_multiset([tuple(r) for r in s_rows], s_cols), _rows_to_multiset(
            d_rows, d_cols
        )
        if ms != md:
            diffs = [(a, b) for a, b in zip(ms, md) if a != b][:5]
            problems.append(f"value mismatch, first diffs: {diffs}")
    return (not problems, "; ".join(problems))
