"""Trend fits and correlation matrices (operators/stats.py) vs DuckDB
regr_*/corr oracles (1e-9 relative tolerance — double moments drift
by ulps between engines by design; see module docstring). Uses the
conftest ``duck`` fixture (UTC-pinned, same views as the driver)."""

from __future__ import annotations

import datetime as dt

import pytest

from sensorstream_scalable_sensor_data_pipeline_spark.operators.stats import (
    corr_matrix,
    trend_per_key,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table


def rel_close(a, b, tol=1e-9):
    if a is None or b is None:
        return a is None and b is None
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


def test_trend_matches_duckdb(spark, duck, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    got = {
        r["user_id"]: (r["n"], r["slope_per_s"], r["intercept"], r["r2"])
        for r in trend_per_key(ev, "user_id", "ts", "value").collect()
    }
    want = {
        int(u): (int(n), s, i, r2)
        for u, n, s, i, r2 in duck.execute("""
            SELECT user_id, regr_count(CAST(value AS DOUBLE), epoch_us(ts) / 1000000.0),
                   regr_slope(CAST(value AS DOUBLE), epoch_us(ts) / 1000000.0),
                   regr_intercept(CAST(value AS DOUBLE), epoch_us(ts) / 1000000.0),
                   regr_r2(CAST(value AS DOUBLE), epoch_us(ts) / 1000000.0)
            FROM events GROUP BY user_id
        """).fetchall()
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


def test_trend_min_points_counts_complete_pairs(spark):
    """A NULL timestamp (or value) row does not count toward
    min_points: regr_count gates on the pairs the fit actually used
    (review-found: a 2-point degenerate fit passed as 3 rows)."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(hours=1), 2.0),
        (1, None, 50.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    r = trend_per_key(df, "k", "ts", "v", min_points=3).collect()[0]
    assert r["n"] == 2  # complete pairs, not raw rows
    assert r["slope_per_s"] is None and r["r2"] is None


def test_corr_matrix_matches_duckdb(spark, duck, sf_dir):
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
        w = duck.execute(
            f"SELECT corr(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE)), "
            f"count(CASE WHEN {a} IS NOT NULL AND {b} IS NOT NULL THEN 1 END) "
            "FROM lineitem"
        ).fetchone()
        assert rel_close(c, w[0]), (a, b)
        assert n == w[1]
    with pytest.raises(ValueError):
        corr_matrix(li, ["l_quantity"])
    with pytest.raises(ValueError):
        corr_matrix(li, ["l_quantity", "l_quantity"])


def test_corr_pairwise_complete_with_nulls(spark):
    """NULL holes: moments and n use only complete pairs — the lone
    x=100 opposite a NULL y must not inflate stddev(x) (review-found:
    per-column stddevs gave 0.02 where native corr says 1.0)."""
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (100.0, None)],
        "x double, y double",
    )
    r = corr_matrix(df, ["x", "y"]).collect()[0]
    assert r["corr"] == pytest.approx(1.0, rel=1e-9)
    assert r["n"] == 3


def test_corr_constant_column_null(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
    )
    r = corr_matrix(df, ["x", "y"]).collect()[0]
    assert r["corr"] is None  # zero variance -> NULL, engine semantics
    assert r["n"] == 3
