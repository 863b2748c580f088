"""Distributed EWMA (operators/recurrence.py) vs pandas — the oracle
is pandas' own sequential ``ewm(alpha, adjust=False)`` per key, the
same parity discipline as the `merge_asof` suite. Boundary
linearization reorders float ops, so parity is rtol-1e-9, not
hash-exact (documented in the module docstring)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.recurrence import ewma
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
    load_table,
)


def _pandas_oracle(df, alpha):
    out = {}
    for key, grp in df.sort_values(["user_id", "ts"]).groupby("user_id"):
        y = grp["value"].ewm(alpha=alpha, adjust=False).mean().to_numpy()
        for ts, v in zip(grp["ts"], y):
            out[(key, ts)] = v
    return out


@pytest.mark.parametrize("alpha", [0.05, 0.3, 0.9])
def test_ewma_matches_pandas(spark, sf_dir, alpha):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    got = {
        (r["user_id"], r["ts"]): r["ewma"]
        for r in ewma(
            ev, on="user_id", time_col="ts", value_col="value",
            alpha=alpha, chunk_rows=7,  # small chunks → many boundaries
        ).collect()
    }
    want = _pandas_oracle(ev.toPandas(), alpha)
    assert set(got) == set(want)
    g = np.array([got[k] for k in sorted(got)])
    w = np.array([want[k] for k in sorted(want)])
    assert np.allclose(g, w, rtol=1e-9, atol=1e-12), (
        f"max rel err {np.max(np.abs(g - w) / np.maximum(np.abs(w), 1e-12))}"
    )


def test_ewma_chunk_size_invariance(spark, sf_dir):
    """The split is an execution detail: chunk_rows=3 (maximum
    boundary count) and chunk_rows=10^6 (single chunk — the pure
    sequential fold) agree to float tolerance."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    kw = dict(on="user_id", time_col="ts", value_col="value", alpha=0.2)
    tiny = {
        (r["user_id"], r["ts"]): r["ewma"]
        for r in ewma(ev, chunk_rows=3, **kw).collect()
    }
    one = {
        (r["user_id"], r["ts"]): r["ewma"]
        for r in ewma(ev, chunk_rows=1_000_000, **kw).collect()
    }
    assert set(tiny) == set(one)
    ks = sorted(tiny)
    assert np.allclose(
        [tiny[k] for k in ks], [one[k] for k in ks], rtol=1e-9, atol=1e-12
    )


def test_ewma_init_and_alpha_one(spark):
    """y_0 = x_0 per key (pandas adjust=False init); alpha=1 is the
    identity (no smoothing)."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    df = spark.createDataFrame(
        [(1, t(0), 10.0), (1, t(1), 0.0), (2, t(5), -4.0)],
        "user_id long, ts timestamp, value double",
    )
    got = {
        (r["user_id"], r["ts"].second): r["ewma"]
        for r in ewma(
            df, on="user_id", time_col="ts", value_col="value", alpha=0.5
        ).collect()
    }
    assert got[(1, 0)] == 10.0  # init: first value passes through
    assert got[(1, 1)] == pytest.approx(5.0)  # 0.5*0 + 0.5*10
    assert got[(2, 5)] == -4.0
    ident = {
        r["ts"].second: r["ewma"]
        for r in ewma(
            df.filter(F.col("user_id") == 1),
            on="user_id", time_col="ts", value_col="value", alpha=1.0,
        ).collect()
    }
    assert ident == {0: 10.0, 1: 0.0}


def _numpy_irregular_oracle(df, halflife):
    """Sequential replay of the time-decay recurrence per key."""
    import math

    out = {}
    lam = math.log(2.0) / halflife
    for key, grp in df.sort_values(["user_id", "ts"]).groupby("user_id"):
        y = None
        prev = None
        for ts, x in zip(grp["ts"], grp["value"]):
            if y is None:
                y = x
            else:
                d = math.exp(-lam * (ts - prev).total_seconds())
                y = (1.0 - d) * x + d * y
            prev = ts
            out[(key, ts)] = y
    return out


def test_ewma_irregular_matches_numpy_replay(spark, sf_dir):
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.recurrence import (
        ewma_irregular,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    hl = 6 * 3600.0
    got = {
        (r["user_id"], r["ts"]): r["ewma"]
        for r in ewma_irregular(
            ev, on="user_id", time_col="ts", value_col="value",
            halflife_seconds=hl, chunk_rows=7,
        ).collect()
    }
    want = _numpy_irregular_oracle(ev.toPandas(), hl)
    assert set(got) == set(want)
    ks = sorted(got)
    assert np.allclose(
        [got[k] for k in ks], [want[k] for k in ks], rtol=1e-9, atol=1e-12
    )


def test_ewma_irregular_reduces_to_constant_alpha(spark):
    """On a REGULAR grid the time-decay form equals ewma with
    α = 1 − exp(−ln2·Δt/halflife) — the documented reduction."""
    import datetime as dt
    import math

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.recurrence import (
        ewma_irregular,
    )

    t0 = dt.datetime(2024, 1, 1)
    step, hl = 60.0, 300.0
    df = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(seconds=step * i), float((i * 37) % 11))
            for i in range(25)
        ],
        "user_id long, ts timestamp, value double",
    )
    alpha = 1.0 - math.exp(-math.log(2.0) * step / hl)
    kw = dict(on="user_id", time_col="ts", value_col="value", chunk_rows=4)
    a_out = {
        r["ts"]: r["ewma"]
        for r in ewma(df, alpha=alpha, **kw).collect()
    }
    h_out = {
        r["ts"]: r["ewma"]
        for r in ewma_irregular(df, halflife_seconds=hl, **kw).collect()
    }
    ks = sorted(a_out)
    assert np.allclose(
        [a_out[k] for k in ks], [h_out[k] for k in ks], rtol=1e-9
    )


def test_ewma_rejections(spark):
    df = spark.createDataFrame([(1, 1, 1.0)], "user_id long, ts long, value double")
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, "user_id", "ts", "value", alpha=0.0)
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, "user_id", "ts", "value", alpha=1.5)
    with pytest.raises(ValueError, match="chunk_rows"):
        ewma(df, "user_id", "ts", "value", alpha=0.5, chunk_rows=1)


def test_ewma_plan_no_python(spark, sf_dir):
    """Entirely Catalyst higher-order folds — no EvalPython node
    (zero-UDF discipline, §2.11) and no cartesian anywhere."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    plan = (
        ewma(ev, on="user_id", time_col="ts", value_col="value", alpha=0.3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
