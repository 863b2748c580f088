"""As-of join vs DuckDB's NATIVE ASOF JOIN — the strongest oracle
available for the semantics (inclusive ≤, latest-state-wins, null
when nothing precedes). Local-oracle (registry sits at the driver's
50-row cap); plan shape pinned: one keyed window shuffle, no range
join degenerating into per-key cross products."""

from __future__ import annotations

from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.asof import asof_join
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table
from tests.oracle_check import assert_frames_match


def _calib(ev):
    """A deterministic 'calibration state' side: every 97th event is a
    state change carrying its value."""
    return ev.filter(F.col("event_id") % 97 == 0).select(
        "user_id", "ts", F.col("value").alias("calib_value")
    )


def test_asof_join_matches_native_duckdb(spark, duck, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    got = asof_join(
        ev, _calib(ev), on="user_id", time_col="ts", value_cols=["calib_value"]
    ).select("event_id", "calib_value")
    oracle = """
    WITH ev AS (SELECT event_id, user_id, ts, value FROM events),
    calib AS (
      SELECT user_id, ts, max(value) AS calib_value
      FROM events WHERE event_id % 97 = 0 GROUP BY user_id, ts
    )
    SELECT l.event_id, r.calib_value
    FROM ev l ASOF LEFT JOIN calib r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """
    assert_frames_match(got.toPandas(), duck.sql(oracle).df(), "asof_join")


def test_asof_join_semantics_edges(spark):
    """Inclusive at equal timestamps, latest-state-wins between
    states, null before the first state, keys with no state at all."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, t(5)), (1, t(10)), (1, t(20)), (2, t(7)), (3, t(9))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t(10), 100.0), (1, t(15), 150.0), (2, t(8), 80.0)],
        "k long, ts timestamp, v double",
    )
    got = {
        (r["k"], r["ts"].second): r["v"]
        for r in asof_join(left, right, "k", "ts", ["v"]).collect()
    }
    assert got[(1, 5)] is None  # before any state
    assert got[(1, 10)] == 100.0  # inclusive at equality
    assert got[(1, 20)] == 150.0  # latest preceding state wins
    assert got[(2, 7)] is None  # state exists but only later
    assert got[(3, 9)] is None  # key with no state rows


def test_asof_join_plan_is_single_keyed_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    plan = (
        asof_join(ev, _calib(ev), "user_id", "ts", ["calib_value"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") >= 1
