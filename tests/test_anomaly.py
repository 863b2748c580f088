"""Anomaly operators (operators/anomaly.py) vs DuckDB oracles over
the events table, plus planted-spike properties."""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.anomaly import (
    detect_gaps,
    mad_outliers,
    rolling_zscore,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
EV = os.path.join(SF_DIR, "events.parquet")


@pytest.fixture(scope="module")
def events(spark):
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "events").select("user_id", "ts", "value")


def duck(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


# ----------------------------------------------------------------- gaps

GAP_S = 6 * 3600


def test_detect_gaps_matches_oracle(spark, events):
    got = {
        (r["user_id"], str(r["gap_start"]), str(r["gap_end"]), r["gap_seconds"])
        for r in detect_gaps(events, "user_id", "ts", GAP_S).collect()
    }
    want = {
        (u, str(s), str(e), g)
        for u, s, e, g in duck(f"""
            SELECT user_id, prev AS gap_start, ts AS gap_end,
                   CAST(epoch_us(ts) - epoch_us(prev) AS DOUBLE) / 1000000.0
            FROM (
              SELECT user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
              FROM read_parquet('{EV}')
            )
            WHERE epoch_us(ts) - epoch_us(prev) > CAST({GAP_S} AS BIGINT) * 1000000
        """)
    }
    assert got == want
    assert got  # the threshold actually fires on this data


def test_detect_gaps_first_reading_opens_none(spark):
    one = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "user_id long, ts timestamp"
    )
    assert detect_gaps(one, "user_id", "ts", 1).count() == 0


# --------------------------------------------------------------- zscore

WIN_S = 7 * 24 * 3600
ZT = 2.0


def test_rolling_zscore_matches_oracle(spark, events):
    rows = rolling_zscore(events, "user_id", "ts", "value", WIN_S, ZT).collect()
    got = {
        (r["user_id"], str(r["ts"])): (r["zscore"], r["is_anomaly"]) for r in rows
    }
    want = duck(f"""
        WITH g AS (
          SELECT user_id, ts, epoch_us(ts) AS us,
                 CAST(value AS DOUBLE) AS v
          FROM read_parquet('{EV}')
        ),
        w AS (
          SELECT user_id, ts, v,
                 SUM(CAST(FLOOR(v * 1000000.0) AS BIGINT)) OVER tw AS s1,
                 SUM(CAST(FLOOR(v * v * 1000000.0) AS BIGINT)) OVER tw AS s2,
                 COUNT(v) OVER tw AS n
          FROM g
          WINDOW tw AS (
            PARTITION BY user_id ORDER BY us
            RANGE BETWEEN CAST({WIN_S} AS BIGINT) * 1000000 PRECEDING AND CURRENT ROW
          )
        )
        SELECT user_id, ts,
               CASE WHEN n >= 5 AND
                         CAST(s2 AS DOUBLE)/1000000.0/n
                         - (CAST(s1 AS DOUBLE)/1000000.0/n)
                           * (CAST(s1 AS DOUBLE)/1000000.0/n) > 0
                    THEN (v - CAST(s1 AS DOUBLE)/1000000.0/n)
                         / sqrt(CAST(s2 AS DOUBLE)/1000000.0/n
                                - (CAST(s1 AS DOUBLE)/1000000.0/n)
                                  * (CAST(s1 AS DOUBLE)/1000000.0/n))
               END AS z
        FROM w
    """)
    assert len(got) == len(want)
    n_flagged = 0
    for u, ts, z in want:
        gz, gflag = got[(u, str(ts))]
        if z is None:
            assert gz is None and gflag is False
        else:
            assert gz == z  # bit-identical, not approx — the grid doctrine
            assert gflag == (abs(z) >= ZT)
            n_flagged += abs(z) >= ZT
    assert n_flagged > 0  # threshold exercises both branches


def test_rolling_zscore_planted_spike(spark):
    t0 = dt.datetime(2024, 1, 1)
    # noisy-but-stable baseline (alternating ±0.2 -> every |z| ~= 1),
    # then one 500.0 spike: only the spike crosses |z| >= 3
    rows = [
        (1, t0 + dt.timedelta(minutes=i), 10.0 + 0.2 * (-1) ** i)
        for i in range(20)
    ]
    rows.append((1, t0 + dt.timedelta(minutes=20), 500.0))  # the spike
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = rolling_zscore(df, "user_id", "ts", "value", 3600, 3.0)
    flagged = [str(r["ts"]) for r in out.filter("is_anomaly").collect()]
    assert flagged == ["2024-01-01 00:20:00"]
    # warm-up rows below min_points carry NULL z and never flag
    nulls = out.filter(F.col("zscore").isNull()).count()
    assert nulls == 4


def test_rolling_zscore_constant_signal_never_flags(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(minutes=i), 10.0) for i in range(10)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = rolling_zscore(df, "user_id", "ts", "value", 3600, 3.0)
    assert out.filter("is_anomaly").count() == 0
    assert out.filter(F.col("zscore").isNotNull()).count() == 0  # zero var


# ------------------------------------------------------------------ mad

K = 4.0


def test_mad_outliers_matches_oracle(spark, events):
    rows = mad_outliers(events, "user_id", "value", K).collect()
    got = {
        (r["user_id"], str(r["ts"])): (r["median"], r["mad"], r["is_outlier"])
        for r in rows
    }
    want = duck(f"""
        WITH m AS (
          SELECT user_id, quantile_cont(value, 0.5) AS med
          FROM read_parquet('{EV}') GROUP BY user_id
        ),
        d AS (
          SELECT e.user_id, e.ts, e.value, m.med,
                 abs(CAST(e.value AS DOUBLE) - m.med) AS ad
          FROM read_parquet('{EV}') e JOIN m USING (user_id)
        ),
        md AS (SELECT user_id, quantile_cont(ad, 0.5) AS mad FROM d GROUP BY user_id)
        SELECT d.user_id, d.ts, d.med, md.mad,
               CASE WHEN md.mad > 0 THEN d.ad > {K} * md.mad ELSE d.ad > 0 END
        FROM d JOIN md USING (user_id)
    """)
    assert len(got) == len(want)
    for u, ts, med, mad, flag in want:
        gm, gmad, gflag = got[(u, str(ts))]
        assert gm == med and gmad == mad and gflag == flag


def test_mad_zero_flags_only_deviants(spark):
    rows = [(1, float(v)) for v in [5, 5, 5, 5, 5, 9]]
    df = spark.createDataFrame(rows, "user_id long, value double")
    out = mad_outliers(df, "user_id", "value", 4.0).collect()
    assert {r["value"]: r["is_outlier"] for r in out} == {5.0: False, 9.0: True}
    assert all(r["mad"] == 0.0 for r in out)


def test_mad_outliers_quoted_value_column(spark):
    """A value column whose name a SQL parser rejects (space, hyphen)
    must work — the interpolated-identifier defect class (r7 verdict
    #4): the median/MAD aggregates now use the Column API, never a
    parsed expression string. (Dots stay subject to Spark's own
    ``F.col`` struct-access convention, as everywhere.)"""
    rows = [("k1", 1.0), ("k1", 1.1), ("k1", 0.9), ("k1", 50.0), ("k1", 1.05)]
    df = spark.createDataFrame(rows, ["k", "sensor value-raw"])
    got = mad_outliers(df, "k", "sensor value-raw", k=6.0)
    flagged = [r["sensor value-raw"] for r in got.collect() if r["is_outlier"]]
    assert flagged == [50.0]
