"""Funnel / event-sequence matching (operators/funnel.py) vs DuckDB's
NATIVE chained ASOF JOIN — the same strongest-oracle discipline as
the as-of suite — plus hand-built edge semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.funnel import (
    funnel_counts,
    funnel_match,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
    load_table,
)
from tests.oracle_check import assert_frames_match


def test_funnel_match_matches_chained_duckdb_asof(spark, duck, sf_dir):
    """Three-step view → click → purchase funnel over REAL events:
    the backward chain must equal DuckDB's chained native ASOF
    INNER JOINs (inclusive ≤, latest match), anchored per purchase."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    got = funnel_match(
        ev, on="user_id", time_col="ts", type_col="event_type",
        steps=["view", "click", "purchase"],
    )
    oracle = """
    WITH p AS (SELECT user_id, ts FROM events WHERE event_type='purchase'),
         c AS (SELECT user_id, ts FROM events WHERE event_type='click'),
         v AS (SELECT user_id, ts FROM events WHERE event_type='view')
    SELECT p.user_id, v.ts AS ts_0, c.ts AS ts_1, p.ts AS ts_2
    FROM p
    ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ASOF JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
    """
    assert_frames_match(got.toPandas(), duck.sql(oracle).df(), "funnel_match")


def test_funnel_within_matches_duckdb(spark, duck, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    got = funnel_match(
        ev, on="user_id", time_col="ts", type_col="event_type",
        steps=["signup", "purchase"], within_seconds=86_400,
    )
    oracle = """
    WITH p AS (SELECT user_id, ts FROM events WHERE event_type='purchase'),
         s AS (SELECT user_id, ts FROM events WHERE event_type='signup')
    SELECT p.user_id, s.ts AS ts_0, p.ts AS ts_1
    FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    WHERE epoch_us(p.ts - s.ts) <= CAST(86400 AS BIGINT) * 1000000
    """
    assert_frames_match(got.toPandas(), duck.sql(oracle).df(), "funnel_within")


def test_funnel_semantics_edges(spark):
    """Last-touch backward matching on a hand-built stream: the chain
    anchors each final-step event to the LATEST prior steps; chains
    missing any step never emit; interleaved other events are gaps,
    not breaks; ties attach inclusively."""
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # key 1: A(1) B(3) A(4) B(6) C(8) → chain uses A(4), B(6)
        (1, t(1), "A"), (1, t(3), "B"), (1, t(4), "A"),
        (1, t(6), "B"), (1, t(8), "C"),
        # key 1: noise between steps is a gap
        (1, t(5), "X"),
        # key 2: B before any A → no chain for its C
        (2, t(1), "B"), (2, t(2), "C"),
        # key 3: A and B at the SAME instant as C — inclusive ties
        (3, t(5), "A"), (3, t(5), "B"), (3, t(5), "C"),
    ]
    ev = spark.createDataFrame(rows, "k long, ts timestamp, et string")
    got = {
        (r["k"], r["ts_2"].second): (r["ts_0"].second, r["ts_1"].second)
        for r in funnel_match(
            ev, on="k", time_col="ts", type_col="et", steps=["A", "B", "C"]
        ).collect()
    }
    assert got == {(1, 8): (4, 6), (3, 5): (5, 5)}
    # within bound: key 1's span is 4 s; a 3 s budget drops it
    tight = funnel_match(
        ev, on="k", time_col="ts", type_col="et",
        steps=["A", "B", "C"], within_seconds=3,
    )
    assert {r["k"] for r in tight.collect()} == {3}


def test_funnel_counts_keys_monotone(spark, sf_dir):
    """n_keys is monotone non-increasing in depth (a key with a
    depth-d chain owns every prefix chain); n_chains is NOT (chains
    anchor on the d-th step's occurrences, which can outnumber the
    first step's). Depth 1 equals the raw first-step count."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    out = {
        r["depth"]: (r["step"], r["n_chains"], r["n_keys"])
        for r in funnel_counts(
            ev, on="user_id", time_col="ts", type_col="event_type",
            steps=["view", "click", "purchase"],
        ).collect()
    }
    n_views = ev.filter(F.col("event_type") == "view").count()
    assert out[1] == ("view", n_views, out[1][2])
    assert out[1][2] >= out[2][2] >= out[3][2]
    assert out[2][0] == "click" and out[3][0] == "purchase"
    assert out[2][1] > 0 and out[3][1] > 0


def test_funnel_rejections(spark):
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "A")], "k long, ts timestamp, et string"
    )
    with pytest.raises(ValueError, match="at least 2"):
        funnel_match(ev, "k", "ts", "et", ["A"])
    with pytest.raises(ValueError, match="identical steps"):
        funnel_match(ev, "k", "ts", "et", ["A", "A"])
    with pytest.raises(ValueError, match="non-negative"):
        funnel_match(ev, "k", "ts", "et", ["A", "B"], within_seconds=-1)


def _land(tmp_path, name, dfs):
    """One file per frame → deterministic micro-batch order under
    maxFilesPerTrigger=1 (same helper shape as test_asof.py)."""
    import glob
    import os
    import shutil

    landing = str(tmp_path / name)
    os.makedirs(landing, exist_ok=True)
    for i, df in enumerate(dfs):
        stage = str(tmp_path / f"_{name}_{i}")
        df.coalesce(1).write.parquet(stage)
        src = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(landing, f"{i:03d}.parquet"))
    return landing


def _stream_dir(spark, landing):
    phys = spark.read.parquet(landing).schema
    return (
        spark.readStream.schema(phys)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )


def test_stream_funnel_equals_batch(spark, sf_dir, tmp_path):
    """The streaming face drained over bounded multi-micro-batch input
    equals the batch funnel_match exactly (chains as epoch-micros)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.streaming.funnel import (
        stream_funnel,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.streaming.pipeline import (
        drain_to_memory,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 5 == 0)
        .select("user_id", "ts", "event_type")
    )
    mx = ev.agg(F.max("ts")).collect()[0][0]
    flush = spark.createDataFrame(
        [(999_999, mx + dt.timedelta(days=400), "view")], ev.schema
    )
    # split across micro-batches: odd rows, then even rows, then flush
    a = ev.filter(F.col("ts").cast("long") % 2 == 1)
    b = ev.filter(F.col("ts").cast("long") % 2 == 0)
    stream = _stream_dir(spark, _land(tmp_path, "fev", [a, b, flush]))
    out = stream_funnel(
        stream, on="user_id", time_col="ts", type_col="event_type",
        steps=["view", "click", "purchase"], watermark="1 minute",
    )
    got = sorted(
        (r["user_id"], r["ts_us_0"], r["ts_us_1"], r["ts_us_2"])
        for r in drain_to_memory(out, output_mode="append").collect()
        if r["user_id"] != 999_999
    )
    want = sorted(
        (
            r["user_id"],
            *[
                int(r[f"ts_{i}"].replace(tzinfo=None).timestamp() * 1_000_000)
                for i in range(3)
            ],
        )
        for r in funnel_match(
            ev, on="user_id", time_col="ts", type_col="event_type",
            steps=["view", "click", "purchase"],
        ).collect()
    )
    assert got == want and got


def test_stream_funnel_late_prior_step_still_chains(spark, tmp_path):
    """The event-time guarantee: a prior step DELIVERED after the
    final step's micro-batch, with an earlier event time, still forms
    the chain — finals finalize only when the watermark proves no
    earlier step can arrive."""
    from sensorstream_scalable_sensor_data_pipeline_spark.streaming.funnel import (
        stream_funnel,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.streaming.pipeline import (
        drain_to_memory,
    )

    t0 = dt.datetime(2024, 1, 1)
    schema = "k long, ts timestamp, et string"
    batch1 = spark.createDataFrame([(1, t0 + dt.timedelta(hours=5), "B")], schema)
    late_a = spark.createDataFrame(  # earlier event time, later delivery
        [(1, t0 + dt.timedelta(hours=3), "A")], schema
    )
    flush = spark.createDataFrame([(9, t0 + dt.timedelta(days=400), "A")], schema)
    stream = _stream_dir(spark, _land(tmp_path, "lfev", [batch1, late_a, flush]))
    out = stream_funnel(
        stream, on="k", time_col="ts", type_col="et",
        steps=["A", "B"], watermark="1 minute",
    )
    rows = [
        r
        for r in drain_to_memory(out, output_mode="append").collect()
        if r["k"] == 1
    ]
    assert len(rows) == 1
    assert rows[0]["ts_us_0"] < rows[0]["ts_us_1"]


def test_stream_funnel_within_bound(spark, tmp_path):
    """The span bound drops over-budget chains in the stream too."""
    from sensorstream_scalable_sensor_data_pipeline_spark.streaming.funnel import (
        stream_funnel,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.streaming.pipeline import (
        drain_to_memory,
    )

    t0 = dt.datetime(2024, 1, 1)
    schema = "k long, ts timestamp, et string"
    data = spark.createDataFrame(
        [
            (1, t0, "A"), (1, t0 + dt.timedelta(seconds=2), "B"),  # span 2 s
            (2, t0, "A"), (2, t0 + dt.timedelta(hours=2), "B"),  # span 2 h
        ],
        schema,
    )
    flush = spark.createDataFrame([(9, t0 + dt.timedelta(days=400), "A")], schema)
    stream = _stream_dir(spark, _land(tmp_path, "wfev", [data, flush]))
    out = stream_funnel(
        stream, on="k", time_col="ts", type_col="et",
        steps=["A", "B"], within_seconds=10, watermark="1 minute",
    )
    got = {r["k"] for r in drain_to_memory(out, output_mode="append").collect()}
    assert got == {1}


def test_funnel_plan_no_cartesian(spark, sf_dir):
    """n−1 keyed as-of windows, never a cross product (the naive
    inequality-join formulation would be one)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    plan = (
        funnel_match(
            ev, on="user_id", time_col="ts", type_col="event_type",
            steps=["view", "click", "purchase"],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_funnel_skew_routes_equivalent(spark):
    """Hot-key escalation (r11): under 50 %-of-rows-on-one-key skew,
    the three routes — plain (bucket_seconds=None), pinned bucketed
    (int), and the auto pre-flight — produce the identical chain set;
    and on this workload the pre-flight (tiny target for the test)
    actually ENGAGES the bucketed path."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.asof import (
        hot_key_bucket_seconds,
    )

    # 6000 events, half on key 0: view/click/purchase round-robin with
    # deterministic interleaving so chains exist on every key
    rows = []
    types = ["view", "click", "purchase"]
    for i in range(6000):
        k = 0 if i % 2 == 0 else 1 + (i % 7)
        rows.append((k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
                     types[(i // 2) % 3]))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    def chains(bs):
        return sorted(
            tuple(r) for r in funnel_match(
                ev, on="user_id", time_col="ts", type_col="event_type",
                steps=types, bucket_seconds=bs,
            ).collect()
        )

    plain = chains(None)
    assert len(plain) > 0
    assert chains(600) == plain           # pinned bucketed
    assert chains("auto") == plain        # default pre-flight route
    # the pre-flight sees the hot key at a test-scaled target
    assert (
        hot_key_bucket_seconds(
            ev.select("user_id", "ts"), "user_id", "ts", target_rows=1000
        )
        is not None
    )
