"""Kafka ingestion face without a broker: the full
from_json → watermark → dedup → checkpointed-foreachBatch chain over
file-faked frames in Kafka's exact wire shape. Everything downstream
of the source node is the production plan (SURVEY §2.10 north-star
ingestion edge, Architecture.png)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table
from sensorstream_scalable_sensor_data_pipeline_spark.streaming.kafka_face import (
    events_as_kafka_wire,
    parse_kafka_events,
)
from sensorstream_scalable_sensor_data_pipeline_spark.streaming.pipeline import (
    drain_to_parquet,
)


def test_kafka_wire_shape(spark, sf_dir):
    wire = events_as_kafka_wire(spark, sf_dir)
    types = dict(wire.dtypes)
    assert types == {
        "key": "binary",
        "value": "binary",
        "topic": "string",
        "partition": "int",
        "offset": "bigint",
        "timestamp": "timestamp",
        "timestampType": "int",
    }


def test_kafka_parse_chain_end_to_end(spark, sf_dir, tmp_path):
    """Wire frames written TWICE (a re-delivered topic segment) →
    streamed → parsed → deduped-within-watermark → checkpointed sink:
    the result must equal the batch events table exactly, once."""
    wire = events_as_kafka_wire(spark, sf_dir)
    wire_dir = str(tmp_path / "wire")
    wire.write.mode("append").parquet(wire_dir)
    wire.write.mode("append").parquet(wire_dir)  # duplicate delivery

    raw = (
        spark.readStream.schema(wire.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(wire_dir)
    )
    parsed = parse_kafka_events(raw)
    out = drain_to_parquet(parsed, str(tmp_path / "sink"))
    got = spark.read.parquet(out)

    batch = load_table(spark, sf_dir, "events")
    n = batch.count()
    assert batch.select("event_id").distinct().count() == n  # precondition
    assert got.count() == n  # re-delivery removed by dedup state
    # values round-trip the JSON encode/decode exactly
    j = got.select("event_id", F.col("value").alias("v2"), F.col("ts").alias("t2")).join(
        batch.select("event_id", "value", "ts"), "event_id"
    )
    assert j.count() == n
    assert j.filter((F.col("v2") != F.col("value")) | (F.col("t2") != F.col("ts"))).count() == 0


def test_kafka_parse_chain_is_source_agnostic(spark, sf_dir):
    """The same parse expressions run on a BATCH frame of the wire
    shape (what a real read_kafka_stream hands over differs only in
    the source node)."""
    wire = events_as_kafka_wire(spark, sf_dir)
    parsed = parse_kafka_events(wire)
    assert parsed.count() == load_table(spark, sf_dir, "events").count()
    cols = set(parsed.columns)
    assert {"topic", "partition", "offset", "event_id", "ts", "user_id", "value"} <= cols
