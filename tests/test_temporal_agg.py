"""Downsampling and rolling aggregates (operators/asof.py) vs DuckDB
oracles over the events table."""

from __future__ import annotations

import os

import duckdb

from sensorstream_scalable_sensor_data_pipeline_spark.operators.asof import (
    downsample,
    rolling_agg,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
EV = os.path.join(SF_DIR, "events.parquet")


def duck(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_downsample_matches_oracle(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    step = 6 * 3600
    got = {
        (r["user_id"], str(r["bucket_start"])): (
            r["n"], r["mean"], r["min"], r["max"], r["first"], r["last"],
        )
        for r in downsample(ev, "user_id", "ts", "value", step).collect()
    }
    want = {
        (u, str(b)): (n, mean, mn, mx, f, l)
        for u, b, n, mean, mn, mx, f, l in duck(f"""
            SELECT user_id,
                   to_timestamp((epoch_us(ts) // 1000000 // {step}) * {step})
                     AT TIME ZONE 'UTC' AS b,
                   count(value),
                   CAST(sum(CAST(FLOOR(CAST(value AS DOUBLE) * 1000000.0)
                                 AS HUGEINT)) AS DOUBLE) / 1000000.0
                     / count(value),
                   min(value), max(value),
                   min_by(value, ts), max_by(value, ts)
            FROM read_parquet('{EV}') GROUP BY 1, 2
        """)
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k
    # buckets tile: row counts add up
    assert sum(v[0] for v in got.values()) == ev.count()


def test_rolling_agg_matches_oracle(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    win = 7 * 24 * 3600
    got = {
        r["event_id"]: (r["w_n"], r["w_sum"], r["w_mean"], r["w_min"], r["w_max"])
        for r in rolling_agg(ev, "user_id", "ts", "value", win).collect()
    }
    want = {
        int(e): (n, s, m, mn, mx)
        for e, n, s, m, mn, mx in duck(f"""
            SELECT event_id,
                   COUNT(v) OVER tw,
                   CAST(SUM(CAST(FLOOR(v * 1000000.0) AS BIGINT)) OVER tw
                        AS DOUBLE) / 1000000.0,
                   CAST(SUM(CAST(FLOOR(v * 1000000.0) AS BIGINT)) OVER tw
                        AS DOUBLE) / 1000000.0 / COUNT(v) OVER tw,
                   MIN(v) OVER tw, MAX(v) OVER tw
            FROM (SELECT event_id, user_id, epoch_us(ts) AS us,
                         CAST(value AS DOUBLE) AS v
                  FROM read_parquet('{EV}'))
            WINDOW tw AS (
              PARTITION BY user_id ORDER BY us
              RANGE BETWEEN CAST({win} AS BIGINT) * 1000000 PRECEDING
                        AND CURRENT ROW
            )
        """)
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k  # grid sums -> bit-identical


def test_validation(spark, sf_dir):
    import pytest

    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        downsample(ev, "user_id", "ts", "value", 0)
    with pytest.raises(ValueError):
        rolling_agg(ev, "user_id", "ts", "value", -5)


def test_downsample_quoted_time_column(spark):
    """downsample's bucket expression interpolates the time column
    into an expr string — it must backtick-quote the name so parser-
    hostile names (space, hyphen) work (r7 verdict #4)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 10), 1.0),
        (1, dt.datetime(2024, 1, 1, 0, 0, 50), 3.0),
        (1, dt.datetime(2024, 1, 1, 0, 2, 10), 5.0),
    ]
    df = spark.createDataFrame(rows, ["k", "event time-utc", "v"])
    got = downsample(df, "k", "event time-utc", "v", every_seconds=60)
    by_bucket = {r["bucket_start"]: (r["n"], r["first"], r["last"]) for r in got.collect()}
    assert len(by_bucket) == 2
    assert by_bucket[dt.datetime(2024, 1, 1, 0, 0)] == (2, 1.0, 3.0)
    assert by_bucket[dt.datetime(2024, 1, 1, 0, 2)] == (1, 5.0, 5.0)
