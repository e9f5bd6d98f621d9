"""S1/K1 config parity: the Kafka reader/writer option maps must match the
reference's consumer/producer configuration exactly (no broker needed).

Reference facts under test: flight_stream.py:93-100 reads with subscribe=
topic, startingOffsets=latest, failOnDataLoss=false; run_producer.py:143-155
produces JSON-serialized values to a single topic.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

from real_time_flight_data_pipeline_spark.sources.kafka import (
    kafka_json_payload,
    kafka_reader_options,
    kafka_writer_options,
)


def test_reader_options_match_reference_consumer():
    opts = kafka_reader_options("broker:9092", "flights")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "flights",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
    }


def test_writer_options_match_reference_producer():
    opts = kafka_writer_options("broker:9092", "flights", "/ckpt")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "flights",
        "checkpointLocation": "/ckpt",
    }


def test_json_payload_serialization_roundtrips(spark):
    schema = T.StructType(
        [T.StructField("flight_key", T.StringType()), T.StructField("n", T.LongType())]
    )
    df = spark.createDataFrame([("K1", 7)], schema)
    out = kafka_json_payload(df).collect()
    assert out[0].asDict().keys() == {"value"}
    assert json.loads(out[0]["value"]) == {"flight_key": "K1", "n": 7}
