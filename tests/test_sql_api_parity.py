"""SQL API parity: for queries whose oracle SQL is pure ANSI, the SAME SQL
text runs in Spark SQL over the registered views and must produce exactly
the DataFrame builder's rows — one engine, two authoring surfaces, one
answer. (This is also a live check that register_views exposes the tables
correctly for SQL-first users.)"""

from __future__ import annotations

import pytest

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY
from real_time_flight_data_pipeline_spark.sources.parquet import register_views

from .conftest import SF_CORRECT

# Oracles written in the ANSI-portable subset (no DuckDB ::casts/list ops).
_PORTABLE = (
    "pricing_summary",
    "revenue_by_nation",
    "supplier_revenue_by_nation",
    "promo_revenue_share_by_brand",
    "events_daily_full_outer",
    "user_set_ops_all",
    "customers_without_events",
)


@pytest.mark.parametrize("name", _PORTABLE)
def test_sql_text_matches_dataframe_builder(spark, name):
    register_views(spark, SF_CORRECT)
    q = REGISTRY[name]
    via_sql = sorted(map(str, (tuple(r) for r in spark.sql(q.oracle).collect())))
    via_df = sorted(
        map(str, (tuple(r) for r in q.builder(spark, SF_CORRECT).collect()))
    )
    assert via_sql == via_df
