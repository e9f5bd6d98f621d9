"""Kafka source/sink builders (S1/K1).

No broker exists in the test container, so these return *unstarted* readers/
writers configured exactly like the reference (flight_stream.py:93-100:
subscribe, latest offsets, tolerate data loss; run_producer.py:143-155:
JSON-serialized values). The option maps are built as plain dicts so config
parity with the reference is unit-testable without a broker
(tests/test_kafka_config.py); tests exercise the same pipeline through the
file-replay source instead (streaming/pipeline.run_file_replay_stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_reader_options(
    bootstrap: str,
    topic: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Reader config, option-for-option the reference's consumer
    (flight_stream.py:93-100)."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }


def kafka_writer_options(bootstrap: str, topic: str, checkpoint: str) -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": bootstrap,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def kafka_json_payload(df: DataFrame) -> DataFrame:
    """K1 value serialization: every row JSON-encoded into a ``value`` column
    (the Spark twin of the producer's ``json.dumps`` value_serializer,
    run_producer.py:143-147)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
):
    return spark.readStream.format("kafka").options(
        **kafka_reader_options(bootstrap, topic, starting_offsets, fail_on_data_loss)
    )


def kafka_json_writer(df: DataFrame, bootstrap: str, topic: str, checkpoint: str):
    """K1: serialize every row to a JSON value column and stream to Kafka."""
    return kafka_json_payload(df).writeStream.format("kafka").options(
        **kafka_writer_options(bootstrap, topic, checkpoint)
    )
