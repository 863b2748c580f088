"""Kafka ingestion face: the value-parse chain, broker-optional.

The reference's architecture ingests from an IoT feed at the top edge
(Architecture.png; BASELINE.json north star "Kafka/IoT sources"). The
engine's real Kafka read is ``sources.readers.read_kafka_stream`` —
but no broker ships in this container, so the piece that MUST still be
exercised end-to-end is everything after the source node:

    raw Kafka frame (key/value binary + topic/partition/offset)
      → ``from_json(value)`` against an explicit schema
      → ns→timestamp normalization
      → ``withWatermark`` (the cutoff, §2.10)
      → ``dropDuplicatesWithinWatermark`` (idempotent re-ingest)
      → checkpointed ``foreachBatch`` sink

:func:`parse_kafka_events` is that chain, written against the WIRE
schema only — hand it ``read_kafka_stream(...)`` output in production
or :func:`events_as_kafka_wire` frames (the driver's events table
re-serialized into Kafka's exact shape) in tests; the plan is
identical from the parse node down, so swapping sources changes one
line.

Scale notes: ``from_json`` is a codegen expression (no UDF);
per-micro-batch cost is scan-speed. Watermark + keyed dedup state is
O(keys within the watermark), the same bound the batch runner gets
from its lookback window. A real topic at 100 TB/day additionally
needs ``maxOffsetsPerTrigger`` (``kafka_read_options`` sets it) so a
recovering stream cannot pull the whole backlog into one batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sensorstream_scalable_sensor_data_pipeline_spark.session import prepare_session

#: The payload schema INSIDE ``value`` — explicit, never inferred
#: (schema inference on a stream is a correctness bug: a batch with
#: missing fields silently retypes columns).
KAFKA_EVENTS_VALUE_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # epoch nanoseconds, as landed
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def parse_kafka_events(raw: DataFrame, watermark: str = "30 days") -> DataFrame:
    """The production parse chain over a raw Kafka frame (streaming or
    batch — the expressions are source-agnostic): JSON-decode
    ``value``, normalize the ns epoch to an event-time timestamp,
    bound lateness with a watermark, and make re-ingest idempotent
    with keyed dedup state.

    The 30-day default mirrors the batch runner's ``lookback_days``
    (main_pipeline.py:36) — the same lateness horizon, expressed as
    watermark delay instead of a cutoff re-extract."""
    parsed = raw.select(
        "topic",
        "partition",
        "offset",
        F.from_json(F.col("value").cast("string"), KAFKA_EVENTS_VALUE_SCHEMA).alias(
            "e"
        ),
    )
    ev = parsed.select("topic", "partition", "offset", "e.*").withColumn(
        "ts", F.expr("timestamp_micros(ts div 1000)")
    )
    if raw.isStreaming:
        return ev.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return ev.dropDuplicates(["event_id"])


def events_as_kafka_wire(
    spark: SparkSession, sf_dir: str, topic: str = "sensors.raw"
) -> DataFrame:
    """The driver's events table re-serialized into Kafka's exact wire
    shape (key/value binary, topic, partition, offset, timestamp,
    timestampType) — what ``read_kafka_stream`` would deliver if this
    topic carried the same readings. Written to a directory and read
    back with ``readStream``, it is a faithful broker stand-in: every
    node downstream of the source is the production plan."""
    import os

    prepare_session(spark)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # The WIRE format is fixed — payload ``ts`` is epoch nanoseconds
    # (KAFKA_EVENTS_VALUE_SCHEMA) no matter which physical form this
    # testdata generation stores (ns-long or timestamp[us]); producers
    # don't change their contract when a warehouse retypes a column.
    ts_dt = dict(ev.dtypes).get("ts")
    if ts_dt != "bigint":
        from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
            normalize_event_ts,
        )

        ev = normalize_event_ts(ev).withColumn(
            "ts", (F.unix_micros(F.col("ts")) * F.lit(1000)).cast("long")
        )
    payload = F.to_json(
        F.struct("event_id", "ts", "user_id", "event_type", "value")
    )
    return ev.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.col("user_id"), F.lit(4)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.expr("timestamp_micros(ts div 1000)").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
