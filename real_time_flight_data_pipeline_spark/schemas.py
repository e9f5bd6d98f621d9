"""All explicit StructTypes. Nothing in this engine infers a schema.

The flight wire schema mirrors the reference's declared Kafka JSON contract
(reference: apps/spark_app/flight_stream.py:106-144); the staging / dim / fact
schemas mirror its warehouse DDL (reference: db/00_warehous.sql:22-134) with
Postgres types mapped to Spark types per SURVEY.md §1.3. Testdata schemas
match /root/testdata parquet exactly (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str) -> T.StructField:
    return T.StructField(name, T.StringType(), True)


# --------------------------------------------------------------------------
# Flight wire schema (Kafka JSON value). Two-level nested structs; every
# field nullable; delay_min is the only non-string leaf.
# --------------------------------------------------------------------------
FLIGHT_WIRE_SCHEMA = T.StructType(
    [
        _s("flight_key"),
        _s("flight_date"),
        _s("status"),
        T.StructField(
            "airline",
            T.StructType([_s("iata"), _s("icao"), _s("name")]),
            True,
        ),
        T.StructField(
            "flight",
            T.StructType([_s("number"), _s("iata"), _s("icao")]),
            True,
        ),
        T.StructField(
            "departure",
            T.StructType(
                [
                    _s("airport"),
                    _s("iata"),
                    _s("icao"),
                    _s("gate"),
                    _s("terminal"),
                    _s("schedule"),
                    _s("estimated"),
                    _s("actual"),
                    T.StructField("delay_min", T.IntegerType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "arrival",
            T.StructType(
                [
                    _s("airport"),
                    _s("iata"),
                    _s("icao"),
                    _s("gate"),
                    _s("terminal"),
                    _s("schedule"),
                    _s("estimated"),
                    _s("actual"),
                    T.StructField("delay_min", T.IntegerType(), True),
                ]
            ),
            True,
        ),
        _s("ingest_time"),
        _s("source"),
    ]
)

# --------------------------------------------------------------------------
# Flat staging schema (29 columns; reference db/00_warehous.sql:23-60).
# --------------------------------------------------------------------------
STAGING_SCHEMA = T.StructType(
    [
        T.StructField("flight_key", T.StringType(), False),
        T.StructField("flight_date", T.DateType(), True),
        _s("status"),
        T.StructField("ingest_time", T.TimestampType(), True),
        _s("flight_number"),
        _s("flight_iata"),
        _s("flight_icao"),
        _s("airline_iata"),
        _s("airline_icao"),
        _s("airline_name"),
        _s("dep_airport"),
        _s("dep_airport_iata"),
        _s("dep_airport_icao"),
        _s("dep_terminal"),
        _s("dep_gate"),
        T.StructField("dep_scheduled", T.TimestampType(), True),
        T.StructField("dep_estimated", T.TimestampType(), True),
        T.StructField("dep_actual", T.TimestampType(), True),
        T.StructField("dep_delay_min", T.DoubleType(), True),
        _s("arr_airport"),
        _s("arr_airport_iata"),
        _s("arr_airport_icao"),
        _s("arr_terminal"),
        _s("arr_gate"),
        T.StructField("arr_scheduled", T.TimestampType(), True),
        T.StructField("arr_estimated", T.TimestampType(), True),
        T.StructField("arr_actual", T.TimestampType(), True),
        T.StructField("arr_delay_min", T.DoubleType(), True),
        _s("source"),
    ]
)

# Dim schemas use deterministic hash surrogate keys (SURVEY.md §7.2 step 3 /
# M6): xxhash64 of the natural key, stable across retries -> idempotent merge.
DIM_AIRLINE_SCHEMA = T.StructType(
    [
        T.StructField("airline_id", T.LongType(), False),
        _s("iata"),
        _s("icao"),
        _s("airline_name"),
    ]
)
DIM_AIRPORT_SCHEMA = T.StructType(
    [
        T.StructField("airport_id", T.LongType(), False),
        _s("iata"),
        _s("icao"),
        _s("airport_name"),
    ]
)
DIM_ROUTE_SCHEMA = T.StructType(
    [
        T.StructField("route_id", T.LongType(), False),
        T.StructField("dep_airport_id", T.LongType(), True),
        T.StructField("arr_airport_id", T.LongType(), True),
    ]
)
FACT_SCHEMA = T.StructType(
    [
        T.StructField("flight_key", T.StringType(), False),
        T.StructField("flight_date", T.DateType(), True),
        _s("status"),
        T.StructField("ingest_time", T.TimestampType(), True),
        T.StructField("airline_id", T.LongType(), True),
        T.StructField("route_id", T.LongType(), True),
        T.StructField("dep_scheduled", T.TimestampType(), True),
        T.StructField("dep_estimated", T.TimestampType(), True),
        T.StructField("dep_actual", T.TimestampType(), True),
        T.StructField("dep_delay_min", T.DoubleType(), True),
        T.StructField("arr_scheduled", T.TimestampType(), True),
        T.StructField("arr_estimated", T.TimestampType(), True),
        T.StructField("arr_actual", T.TimestampType(), True),
        T.StructField("arr_delay_min", T.DoubleType(), True),
        T.StructField("last_updated", T.TimestampType(), True),
    ]
)

# --------------------------------------------------------------------------
# Driver testdata schemas (TESTDATA.md; verified against parquet footers).
# --------------------------------------------------------------------------
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
