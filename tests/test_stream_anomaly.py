"""Streaming rolling z-score (streaming/anomaly.py): bit-equality
with the batch operator under in-order multi-batch delivery, and the
late-reading truncated-window contract."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.anomaly import (
    rolling_zscore,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
    load_table,
    normalize_event_ts,
)
from sensorstream_scalable_sensor_data_pipeline_spark.streaming.anomaly import (
    stream_rolling_zscore,
)
from sensorstream_scalable_sensor_data_pipeline_spark.streaming.pipeline import (
    drain_to_memory,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
WIN_S = 7 * 24 * 3600


def _chronological_landing(spark, sf_dir, tmp_path, n_chunks=4):
    """Write events as n time-ordered files so maxFilesPerTrigger=1
    delivers them as in-order micro-batches (file source processes
    oldest-modified first)."""
    import time

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    rows = ev.orderBy("ts").collect()
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    chunk = (len(rows) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        part = rows[i * chunk : (i + 1) * chunk]
        if not part:
            continue
        spark.createDataFrame(part, ev.schema).coalesce(1).write.parquet(
            str(tmp_path / f"stage{i}")
        )
        # move the single data file into the landing dir in order
        import glob
        import shutil

        src = glob.glob(str(tmp_path / f"stage{i}" / "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(landing, f"{i:03d}.parquet"))
        time.sleep(0.05)  # distinct mtimes -> deterministic file order
    return landing


def _stream_from(spark, landing):
    phys = spark.read.parquet(landing).schema
    raw = (
        spark.readStream.schema(phys)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    return normalize_event_ts(raw)


def test_stream_zscore_equals_batch_inorder(spark, sf_dir, tmp_path):
    landing = _chronological_landing(spark, sf_dir, tmp_path)
    scored = stream_rolling_zscore(
        _stream_from(spark, landing),
        on="user_id", time_col="ts", value_col="value",
        window_seconds=WIN_S, z_threshold=2.0,
    )
    got = {
        (r["user_id"], r["ts_us"]): (r["value"], r["zscore"], r["is_anomaly"])
        for r in drain_to_memory(scored, output_mode="append").collect()
    }
    ev = spark.read.parquet(landing)
    want_rows = rolling_zscore(
        normalize_event_ts(ev).select("user_id", "ts", "value"),
        on="user_id", time_col="ts", value_col="value",
        window_seconds=WIN_S, z_threshold=2.0,
    ).collect()
    want = {
        (r["user_id"], int(r["ts"].timestamp() * 1_000_000)): (
            r["value"], r["zscore"], r["is_anomaly"],
        )
        for r in want_rows
    }
    assert set(got) == set(want)
    n_z = n_flag = 0
    for k in want:
        gv, gz, gf = got[k]
        wv, wz, wf = want[k]
        assert gv == wv, k
        assert gz == wz, k  # bit-identical — the shared grid math
        assert gf == wf, k
        n_z += wz is not None
        n_flag += wf
    assert n_z > 0 and n_flag > 0  # both branches exercised


def test_stream_zscore_each_reading_scored_once(spark, sf_dir, tmp_path):
    landing = _chronological_landing(spark, sf_dir, tmp_path)
    drained = drain_to_memory(
        stream_rolling_zscore(
            _stream_from(spark, landing),
            on="user_id", time_col="ts", value_col="value",
            window_seconds=WIN_S,
        ),
        output_mode="append",
    )
    n = drained.count()
    assert n == spark.read.parquet(landing).count()
    assert drained.select("user_id", "ts_us").distinct().count() == n


def test_stream_zscore_late_reading_truncated_window(spark, tmp_path):
    """A reading delivered AFTER much newer data scores against the
    retained (truncated) window — exact over what is retained, never
    a crash, never a phantom future reading in its window."""
    t0 = dt.datetime(2024, 1, 1)
    w_s = 3600
    early = [(1, t0 + dt.timedelta(minutes=i), 10.0 + 0.2 * (-1) ** i) for i in range(10)]
    later = [(1, t0 + dt.timedelta(hours=5, minutes=i), 20.0 + 0.2 * (-1) ** i) for i in range(10)]
    late = [(1, t0 + dt.timedelta(minutes=30), 10.1)]  # hours behind batch 2
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    import glob
    import shutil
    import time

    for i, chunk in enumerate([early, later, late]):
        df = spark.createDataFrame(chunk, "user_id long, ts timestamp, value double")
        df.coalesce(1).write.parquet(str(tmp_path / f"s{i}"))
        src = glob.glob(str(tmp_path / f"s{i}" / "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(landing, f"{i:03d}.parquet"))
        time.sleep(0.05)
    phys = spark.read.parquet(landing).schema
    stream = (
        spark.readStream.schema(phys)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    out = drain_to_memory(
        stream_rolling_zscore(
            stream, on="user_id", time_col="ts", value_col="value",
            window_seconds=w_s, z_threshold=3.0, min_points=3,
        ),
        output_mode="append",
    ).collect()
    assert len(out) == 21  # every reading scored exactly once
    late_us = int(dt.datetime(2024, 1, 1, 0, 30).timestamp() * 1_000_000)
    late_row = [r for r in out if r["ts_us"] == late_us][0]
    # the early batch's buffer was evicted by batch 2 (5 h newer with a
    # 1 h window), so the late reading sees only itself: below
    # min_points -> NULL z, unflagged — the documented truncation
    assert late_row["zscore"] is None and late_row["is_anomaly"] is False


def test_stream_zscore_string_keys(spark, tmp_path):
    """The operator is key-type generic: string sensor ids flow
    through the state schema and the output unchanged (hardcoded
    'long' was the review-found break)."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (f"sensor-{k}", t0 + dt.timedelta(minutes=i), 10.0 + 0.2 * (-1) ** i)
        for k in ("a", "b")
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "sensor string, ts timestamp, value double")
    landing = str(tmp_path / "landing")
    df.coalesce(1).write.parquet(landing)
    phys = spark.read.parquet(landing).schema
    stream = spark.readStream.schema(phys).parquet(landing)
    out = drain_to_memory(
        stream_rolling_zscore(
            stream, on="sensor", time_col="ts", value_col="value",
            window_seconds=3600, min_points=3,
        ),
        output_mode="append",
    ).collect()
    assert len(out) == 16
    assert {r["sensor"] for r in out} == {"sensor-a", "sensor-b"}
    assert sum(r["zscore"] is not None for r in out) > 0
