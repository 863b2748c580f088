"""Bench heads for the temporal-join family (operators/asof.py).

The sensor-domain daily drivers — as-of enrichment, containment
joins, regular-grid gap-fill, derivatives — generalize the
reference's broadcast enrichment join to time (main_pipeline.py:196).
They are locally oracle-checked against DuckDB's native ASOF /
BETWEEN joins (tests/test_asof.py) but sit outside the driver's
50-row registry cap, so these wrappers give them standing PERF
evidence in bench.py (r3/r4 verdict "What's missing #1").

Workload shapes (at sf0.1: ~100 k events, ~32 keys):

* ``asof_join_head`` — every event enriched with the latest
  "calibration state" (every 97th event plays a state change): the
  canonical reading × slowly-changing-state join. One keyed window
  shuffle.
* ``range_join_head`` — events × 6-hour maintenance windows (every
  151st event opens one): bucketed containment, interval fan-out ~7
  rows each, plain equi-join on (key, hour-bucket).
* ``resample_locf_head`` — every key's span regridded at 15-minute
  steps with carried observations: grid explode (two-level, bounded
  arrays) + the as-of compose.
* ``rate_of_change_head`` — per-key first derivative: one keyed
  window, pure column math.

Each returns the operator's full output (the ``count()`` in bench.py
materializes every row), so the timing covers the real shuffle work,
not a clipped sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.asof import (
    asof_join,
    range_join,
    rate_of_change,
    resample_locf,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )


def _calib_state(ev: DataFrame) -> DataFrame:
    """Deterministic slowly-changing state: every 97th event is a
    calibration change carrying its value (same shape as
    tests/test_asof.py so bench and oracle exercise one workload)."""
    return ev.filter(F.col("event_id") % 97 == 0).select(
        "user_id", "ts", F.col("value").alias("calib_value")
    )


def asof_join_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return asof_join(
        ev, _calib_state(ev), on="user_id", time_col="ts",
        value_cols=["calib_value"],
    )


def range_join_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    wins = ev.filter(F.col("event_id") % 151 == 0).select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("end_ts"),
    )
    return range_join(
        ev.select("event_id", "user_id", "ts"), wins,
        on="user_id", time_col="ts",
        start_col="start_ts", end_col="end_ts", bucket_seconds=3600,
    )


def resample_locf_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return resample_locf(
        ev.select("user_id", "ts", "value"), on="user_id", time_col="ts",
        value_cols=["value"], step_seconds=900,
    )


def rate_of_change_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return rate_of_change(ev, on="user_id", time_col="ts", value_col="value")
