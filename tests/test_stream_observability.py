"""Streaming observability (streaming/observability.py): the
late-drop counter actually counts watermark-dropped rows, and the
summary folds progress correctly."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.streaming.observability import (
    drain_with_progress,
    progress_summary,
)


def _landing(spark, tmp_path, chunks):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, rows in enumerate(chunks):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        df.coalesce(1).write.parquet(str(tmp_path / f"s{i}"))
        src = glob.glob(str(tmp_path / f"s{i}" / "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(landing, f"{i:03d}.parquet"))
        time.sleep(0.05)
    return landing


def test_late_rows_counted_and_dropped(spark, tmp_path):
    """Three on-time micro-batches advance the watermark far past a
    fourth, very-late batch: its rows are dropped by the windowed
    aggregate AND visible in the summary — the silent loss made
    loud."""
    t0 = dt.datetime(2024, 1, 1)
    on_time = [
        [(1, t0 + dt.timedelta(hours=h, minutes=m), 1.0) for m in range(3)]
        for h in (0, 5, 10)
    ]
    very_late = [[(1, t0 + dt.timedelta(minutes=30), 9.0)]]  # ~10h late
    landing = _landing(spark, tmp_path, on_time + very_late)
    phys = spark.read.parquet(landing).schema
    stream = (
        spark.readStream.schema(phys)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    table, progress = drain_with_progress(agg, output_mode="append")
    s = progress_summary(progress)
    assert s["input_rows"] == 10
    assert s["late_rows_dropped"] == 1  # the very-late reading, counted
    assert 0 < s["late_fraction"] <= 0.1
    assert s["n_triggers"] >= 4
    assert s["max_state_rows"] >= 1
    # and the dropped row is genuinely absent from the result
    emitted = table.agg(F.sum("n")).collect()[0][0] or 0
    assert emitted <= 9


def test_no_late_data_clean_summary(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    landing = _landing(
        spark, tmp_path,
        [[(1, t0 + dt.timedelta(minutes=i), 1.0) for i in range(5)]],
    )
    phys = spark.read.parquet(landing).schema
    stream = spark.readStream.schema(phys).parquet(landing)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _, progress = drain_with_progress(agg, output_mode="append")
    s = progress_summary(progress)
    assert s["input_rows"] == 5
    assert s["late_rows_dropped"] == 0
    assert s["late_fraction"] == 0.0
    assert progress_summary([]) == {
        "input_rows": 0,
        "late_rows_dropped": 0,
        "late_fraction": 0.0,
        "max_state_rows": 0,
        "n_triggers": 0,
    }
