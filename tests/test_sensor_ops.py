"""Capstone daily run (plans/sensor_ops.py): the operators compose,
the artifacts reconcile, the gate blocks a bad feed."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.plans.sensor_ops import (
    daily_sensor_report,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table
from sensorstream_scalable_sensor_data_pipeline_spark.sources.writers import (
    verify_manifest,
)


def test_daily_report_artifacts_reconcile(spark, sf_dir, tmp_path):
    out = str(tmp_path / "daily")
    counts = daily_sensor_report(spark, sf_dir, out)
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    # enriched: one row per reading, manifest-verified on re-read
    assert counts["enriched"] == n
    for name in ("enriched", "gaps", "sessions", "hourly"):
        verify_manifest(spark, os.path.join(out, name))
    enriched = spark.read.parquet(os.path.join(out, "enriched"))
    assert {"calib_value", "zscore", "is_anomaly"} <= set(enriched.columns)
    # sessions: event counts reconcile with the feed
    sessions = spark.read.parquet(os.path.join(out, "sessions"))
    assert sessions.agg(F.sum("n_events")).collect()[0][0] == n
    assert counts["sessions"] == sessions.count()
    # hourly rollup: bucket counts reconcile too
    hourly = spark.read.parquet(os.path.join(out, "hourly"))
    assert hourly.agg(F.sum("n")).collect()[0][0] == n
    # gaps exist on this feed at the 6h threshold (events are sparse)
    assert counts["gaps"] > 0


def test_daily_report_gate_blocks_bad_feed(spark, sf_dir, tmp_path, monkeypatch):
    """A feed violating the enriched contract aborts BEFORE any
    artifact lands."""
    import sensorstream_scalable_sensor_data_pipeline_spark.plans.sensor_ops as so

    real = so.load_table

    def poisoned(spark_, sf, name):
        df = real(spark_, sf, name)
        if name == "events":
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 50 == 0, F.lit(-1.0)).otherwise(
                    F.col("value")
                ),
            )
        return df

    monkeypatch.setattr(so, "load_table", poisoned)
    out = str(tmp_path / "daily")
    with pytest.raises(ValueError, match="in_range:value"):
        daily_sensor_report(spark, sf_dir, out)
    assert not os.path.exists(os.path.join(out, "enriched"))
