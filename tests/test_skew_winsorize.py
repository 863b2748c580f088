"""Skew diagnosis (operators/skew.py::diagnose_skew) and percentile
winsorization (operators/profile.py::winsorize)."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.profile import winsorize
from sensorstream_scalable_sensor_data_pipeline_spark.operators.skew import diagnose_skew
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
EV = os.path.join(SF_DIR, "events.parquet")


def test_diagnose_skew_flags_hot_key(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id")
    skewed = ev.withColumn(
        "user_id", F.when(F.col("user_id") % 2 == 0, 7).otherwise(F.col("user_id"))
    )
    rep = diagnose_skew(skewed, ["user_id"], top=5, hot_share=0.05).collect()
    assert rep[0]["user_id"] == 7 and rep[0]["strategy"] == "salt"
    total = skewed.count()
    assert rep[0]["share"] == rep[0]["n_rows"] / total
    assert rep[0]["share"] > 0.4
    # counts descend; cold keys below threshold say hash
    ns = [r["n_rows"] for r in rep]
    assert ns == sorted(ns, reverse=True)
    assert {r["strategy"] for r in rep[1:]} <= {"salt", "hash"}
    uniform = diagnose_skew(ev, ["user_id"], top=5, hot_share=0.5).collect()
    assert all(r["strategy"] == "hash" for r in uniform)


def test_winsorize_matches_oracle(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = winsorize(ev, ["value"], 0.05, 0.95).select("event_id", "value").collect()
    got = {r["event_id"]: r["value"] for r in out}
    con = duckdb.connect()
    want = {
        int(e): v
        for e, v in con.execute(f"""
            WITH b AS (
              SELECT quantile_cont(value, 0.05) AS lo,
                     quantile_cont(value, 0.95) AS hi
              FROM read_parquet('{EV}')
            )
            SELECT event_id,
                   LEAST(GREATEST(value, b.lo), b.hi)
            FROM read_parquet('{EV}'), b
        """).fetchall()
    }
    con.close()
    assert got == want  # exact percentiles + IEEE clamp -> hash-equal


def test_winsorize_suffix_nulls_and_errors(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 100.0), (4, 2.0), (5, 3.0)],
        "k long, v double",
    )
    out = winsorize(df, ["v"], 0.0, 0.5, suffix="_w")
    rows = {r["k"]: (r["v"], r["v_w"]) for r in out.collect()}
    assert rows[2] == (None, None)  # NULL passes through
    assert rows[1][0] == rows[1][1] == 1.0  # original kept with suffix
    assert rows[3][0] == 100.0 and rows[3][1] < 100.0  # clipped copy
    with pytest.raises(ValueError):
        winsorize(df, [], 0.1, 0.9)
    with pytest.raises(ValueError):
        winsorize(df, ["v"], 0.9, 0.1)


def test_winsorize_quoted_column_name(spark):
    """winsorize's percentile bounds now come from the Column API —
    a column name a SQL parser rejects (space, hyphen) must work
    (r7 verdict #4 interpolated-identifier class)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.profile import (
        winsorize,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], ["raw value-x"]
    )
    got = winsorize(df, ["raw value-x"], p_lo=0.05, p_hi=0.95)
    vals = sorted(r["raw value-x"] for r in got.collect())
    assert vals[0] >= 5.0 and vals[-1] <= 96.0
