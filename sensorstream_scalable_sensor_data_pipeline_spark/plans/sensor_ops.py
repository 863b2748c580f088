"""Capstone composition: the daily sensor-operations run (§2.12 —
the end-to-end artifact a SensorStream deployment schedules).

One invocation produces the day's operational tables from the raw
event feed, each persisted with an integrity manifest:

* ``enriched/``   — readings as-of-joined to the latest calibration
  state (operators/asof.py), rolling z-scores + anomaly flags
  attached (operators/anomaly.py);
* ``gaps/``       — transmission-downtime intervals;
* ``sessions/``   — per-user activity sessions (the batch
  ``session_window`` aggregate — same operator the streaming face
  uses, so batch backfill and live drain agree);
* ``hourly/``     — the time-bucket compaction rollup
  (n/mean/min/max/first/last per key-hour).

An expectation gate (operators/dataops.py) blocks the write when the
enriched table violates its contract — the composition fails loudly
BEFORE publishing, not after a consumer reads bad data.

Every stage is an already-oracle-checked operator; what this module
adds — and its test pins — is that they COMPOSE: one pass over the
events scan feeds four outputs whose counts reconcile, and the
artifacts re-read cleanly through their manifests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.anomaly import (
    detect_gaps,
    rolling_zscore,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.asof import (
    asof_join,
    downsample,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.dataops import (
    expect_in_range,
    expect_not_null,
    expect_or_raise,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table
from sensorstream_scalable_sensor_data_pipeline_spark.sources.writers import (
    write_with_manifest,
)

#: Operational knobs, one place (a deployment overrides per site).
GAP_SECONDS = 6 * 3600
ZSCORE_WINDOW_S = 7 * 24 * 3600
Z_THRESHOLD = 3.0
SESSION_GAP_MIN = 30


def daily_sensor_report(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, int]:
    """Run the full daily composition; returns per-artifact row
    counts (the run log line). Raises — writing NOTHING further —
    if the enriched table breaks its contract."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    state = ev.filter(F.col("event_id") % 97 == 0).select(
        "user_id", "ts", F.col("value").alias("calib_value")
    )
    # persisted: the contract gate EXECUTES this (join + 7-day
    # window) and the manifest write would otherwise rebuild it from
    # scratch — the run's dominant cost, paid once not twice
    enriched = rolling_zscore(
        asof_join(ev, state, on="user_id", time_col="ts",
                  value_cols=["calib_value"]),
        on="user_id", time_col="ts", value_col="value",
        window_seconds=ZSCORE_WINDOW_S, z_threshold=Z_THRESHOLD,
    ).persist()
    expect_or_raise(
        enriched,
        [
            expect_not_null("event_id"),
            expect_not_null("ts"),
            expect_in_range("value", 0.0, 1000.0),
        ],
    )
    gaps = detect_gaps(ev, "user_id", "ts", GAP_SECONDS)
    sessions = (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("sw")
    )
    hourly = downsample(ev, "user_id", "ts", "value", 3600)

    counts = {}
    try:
        for name, df in [
            ("enriched", enriched),
            ("gaps", gaps),
            ("sessions", sessions),
            ("hourly", hourly),
        ]:
            m = write_with_manifest(df, os.path.join(out_dir, name))
            counts[name] = m["rows"]
    finally:
        enriched.unpersist()
    return counts
