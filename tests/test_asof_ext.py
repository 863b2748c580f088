"""asof_join_ext (operators/asof.py): pandas merge_asof as the
independent oracle across direction × tolerance, plus parity with the
base operator and duplicate-timestamp handling."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.asof import (
    asof_join,
    asof_join_ext,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def workload(spark):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    state = ev.filter(F.col("event_id") % 97 == 0).select(
        "user_id", "ts", F.col("value").alias("calib")
    )
    readings = ev.select("event_id", "user_id", "ts")
    return readings, state


def pandas_oracle(readings, state, direction, tolerance_seconds=None):
    l = readings.toPandas().sort_values("ts", kind="mergesort")
    r = state.toPandas().sort_values("ts", kind="mergesort")
    kwargs = dict(on="ts", by="user_id", direction=direction)
    if tolerance_seconds is not None:
        kwargs["tolerance"] = pd.Timedelta(seconds=tolerance_seconds)
    m = pd.merge_asof(l, r, **kwargs)
    return {
        int(row.event_id): (None if pd.isna(row.calib) else float(row.calib))
        for row in m.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tol", [None, 6 * 3600])
def test_matches_pandas_merge_asof(spark, workload, direction, tol):
    readings, state = workload
    got = {
        r["event_id"]: r["calib"]
        for r in asof_join_ext(
            readings, state, "user_id", "ts", ["calib"],
            direction=direction, tolerance_seconds=tol,
        ).collect()
    }
    want = pandas_oracle(readings, state, direction, tol)
    assert set(got) == set(want)
    diff = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not diff, dict(list(diff.items())[:5])
    if tol is not None:
        # the tolerance actually bites somewhere on this workload
        full = pandas_oracle(readings, state, direction, None)
        assert any(want[k] is None and full[k] is not None for k in want)


def test_backward_default_equals_base_operator(spark, workload):
    readings, state = workload
    a = {
        r["event_id"]: r["calib"]
        for r in asof_join(readings, state, "user_id", "ts", ["calib"]).collect()
    }
    b = {
        r["event_id"]: r["calib"]
        for r in asof_join_ext(readings, state, "user_id", "ts", ["calib"]).collect()
    }
    assert a == b


def test_nearest_tie_prefers_backward_and_dup_left_rows(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    # state at t0-10s (v=1) and t0+10s (v=2): exact tie at t0
    state = spark.createDataFrame(
        [(1, t0 - dt.timedelta(seconds=10), 1.0),
         (1, t0 + dt.timedelta(seconds=10), 2.0)],
        "user_id long, ts timestamp, calib double",
    )
    # duplicate left rows at the same instant stay distinct
    readings = spark.createDataFrame(
        [(10, 1, t0), (11, 1, t0), (12, 1, t0 + dt.timedelta(seconds=9))],
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r["event_id"]: r["calib"]
        for r in asof_join_ext(
            readings, state, "user_id", "ts", ["calib"], direction="nearest"
        ).collect()
    }
    assert out == {10: 1.0, 11: 1.0, 12: 2.0}
    assert len(out) == 3


def test_ext_validates_inputs(spark, workload):
    readings, state = workload
    with pytest.raises(ValueError):
        asof_join_ext(readings, state, "user_id", "ts", ["calib"], direction="up")
    with pytest.raises(ValueError):
        asof_join_ext(
            readings, state, "user_id", "ts", ["calib"], tolerance_seconds=-1
        )
    with pytest.raises(ValueError):
        asof_join_ext(
            readings.withColumn("calib", F.lit(0.0)),
            state, "user_id", "ts", ["calib"],
        )
