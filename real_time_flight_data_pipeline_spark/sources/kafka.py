"""Kafka source/sink builders (S1/K1).

No broker exists in the test container, so these return *unstarted* readers/
writers configured exactly like the reference (flight_stream.py:93-100:
subscribe, latest offsets, tolerate data loss; run_producer.py:143-155:
JSON-serialized values). Tests exercise the same pipeline through the
file-replay source instead (streaming/pipeline.run_file_replay_stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
):
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )


def kafka_json_writer(df: DataFrame, bootstrap: str, topic: str, checkpoint: str):
    """K1: serialize every row to a JSON value column and stream to Kafka."""
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
