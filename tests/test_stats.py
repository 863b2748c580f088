"""Trend fits and correlation matrices (operators/stats.py) vs DuckDB
regr_*/corr oracles (1e-9 relative tolerance — double moments drift
by ulps between engines by design; see module docstring)."""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest

from sensorstream_scalable_sensor_data_pipeline_spark.operators.stats import (
    corr_matrix,
    trend_per_key,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
EV = os.path.join(SF_DIR, "events.parquet")
LI = os.path.join(SF_DIR, "lineitem.parquet")


def duck(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def rel_close(a, b, tol=1e-9):
    if a is None or b is None:
        return a is None and b is None
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


def test_trend_matches_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    got = {
        r["user_id"]: (r["n"], r["slope_per_s"], r["intercept"], r["r2"])
        for r in trend_per_key(ev, "user_id", "ts", "value").collect()
    }
    want = {
        int(u): (int(n), s, i, r2)
        for u, n, s, i, r2 in duck(f"""
            SELECT user_id, count(value),
                   regr_slope(CAST(value AS DOUBLE), epoch_us(ts) / 1000000.0),
                   regr_intercept(CAST(value AS DOUBLE), epoch_us(ts) / 1000000.0),
                   regr_r2(CAST(value AS DOUBLE), epoch_us(ts) / 1000000.0)
            FROM read_parquet('{EV}') GROUP BY user_id
        """)
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        for gi, wi in zip(got[u][1:], want[u][1:]):
            assert rel_close(gi, wi), (u, gi, wi)


def test_trend_detects_planted_drift(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(hours=i), 10.0 + 0.5 * i) for i in range(48)
    ] + [(2, t0 + dt.timedelta(hours=i), 20.0) for i in range(48)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    got = {r["k"]: r for r in trend_per_key(df, "k", "ts", "v").collect()}
    # 0.5 units/hour = 0.5/3600 units/s, fit is exact on a line
    assert got[1]["slope_per_s"] == pytest.approx(0.5 / 3600, rel=1e-9)
    assert got[1]["r2"] == pytest.approx(1.0, rel=1e-9)
    assert got[2]["slope_per_s"] == pytest.approx(0.0, abs=1e-12)
    # under min_points / zero time variance -> NULL fit, row kept
    tiny = spark.createDataFrame(
        [(3, t0, 1.0), (3, t0, 2.0)], "k long, ts timestamp, v double"
    )
    r = trend_per_key(tiny, "k", "ts", "v").collect()[0]
    assert r["n"] == 2 and r["slope_per_s"] is None


def test_corr_matrix_matches_duckdb(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    got = {
        (r["col_a"], r["col_b"]): (r["corr"], r["n"])
        for r in corr_matrix(li, cols).collect()
    }
    assert set(got) == {
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"),
    }
    for (a, b), (c, n) in got.items():
        w = duck(
            f"SELECT corr(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE)), count(*)"
            f" FROM read_parquet('{LI}')"
        )[0]
        assert rel_close(c, w[0]), (a, b)
        assert n == w[1]
    with pytest.raises(ValueError):
        corr_matrix(li, ["l_quantity"])
    with pytest.raises(ValueError):
        corr_matrix(li, ["l_quantity", "l_quantity"])


def test_corr_constant_column_null(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
    )
    r = corr_matrix(df, ["x", "y"]).collect()[0]
    assert r["corr"] is None  # zero variance -> NULL, engine semantics
