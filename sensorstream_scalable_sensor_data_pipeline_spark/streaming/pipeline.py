"""Structured Streaming face of the engine (SURVEY §2.10, M5).

The reference hand-rolls streaming semantics as scheduled incremental
batch: a cutoff watermark from max materialized datetime bounded by a
30-day lookback (main_pipeline.py:331-341), dropDuplicates for
idempotent re-ingest (:328), daily Airflow trigger. This module
provides the native equivalents — ``withWatermark`` for the cutoff,
``dropDuplicatesWithinWatermark`` for bounded dedup state, windowed
aggregates for rollups, ``foreachBatch`` reusing the batch writers for
the sink, ``Trigger.AvailableNow`` for the scheduled-batch cadence.

Everything runs as a *bounded* stream over the same parquet testdata
(``availableNow`` drains all available input then stops), which makes
the streaming path oracle-checkable: the drained result must equal the
batch query over the same files.

Scale notes: state stores are keyed by (group, window) or dedup key —
per-key state is O(1) and the watermark bounds total state; the
stream-static dim join broadcasts the static side per micro-batch, so
the stream never shuffles for enrichment.
"""

from __future__ import annotations

import itertools
import os
import tempfile

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

#: Reference file-source schema for the events stream with the
#: original ns-as-long physical ``ts`` (TIMESTAMP(NANOS) parquet +
#: nanosAsLong conf). The live stream derives its schema from the
#: actual file footer — the testdata has also shipped ``ts`` as
#: ``timestamp[us]`` (TIMESTAMP_NTZ to Spark), and a streaming source
#: schema must match the physical type exactly.
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

_mem_counter = itertools.count()


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet as a file source, with
    the same event-time normalization as the batch loader
    (``sources.tables.normalize_event_ts``)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
        normalize_event_ts,
    )

    prepare_session(spark)
    # A streaming file source needs an explicit schema; take it from
    # the file footer (one driver-side metadata read, no data scan) so
    # the stream tracks whichever physical ts type this testdata
    # generation uses.
    phys = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # The file source requires a *directory*; scope it to the events
    # file with a glob filter (a real deployment points at a landing
    # directory that receives files over time).
    raw = (
        spark.readStream.schema(phys)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(raw)


def drain_to_memory(
    sdf: DataFrame, output_mode: str, await_seconds: int = 300
) -> DataFrame:
    """Run a bounded stream to completion into a memory sink
    (``availableNow`` trigger) and return the drained result table.

    ORACLE HARNESS ONLY: a memory sink materializes the whole result
    in driver memory — with ``output_mode="complete"`` that is the
    full aggregate state, a driver OOM at 100× scale. The production
    sink is :func:`drain_to_parquet` (checkpointed ``foreachBatch``,
    append semantics, executor-side writes)."""
    name = f"ss_drain_{next(_mem_counter)}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    # a timed-out drain must FAIL, not silently return a partially
    # drained table (review-found: a head aggregating the memory sink
    # while micro-batches still run would record undercounted numbers
    # as standing evidence with no error)
    if not q.awaitTermination(await_seconds):
        q.stop()
        raise RuntimeError(
            f"stream drain {name!r} did not finish within "
            f"{await_seconds}s; partial results discarded"
        )
    return sdf.sparkSession.table(name)


def drain_to_parquet(
    sdf: DataFrame, out_dir: str | None = None, await_seconds: int = 300
) -> str:
    """Run a bounded stream through ``foreachBatch`` into an
    append-mode parquet sink (the reference's S3 writer role) and
    return the output path. Checkpointed — re-running with the same
    checkpoint dir is exactly-once, the native form of the reference's
    idempotent re-ingest."""
    out = out_dir or tempfile.mkdtemp(prefix="ss_sink_")
    ckpt = os.path.join(out, "_checkpoint")
    data = os.path.join(out, "data")

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        bdf.write.mode("append").parquet(data)

    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(await_seconds)
    return data
