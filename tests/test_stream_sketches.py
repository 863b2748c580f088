"""Streaming sketch-table maintenance (streaming/sketches.py):
multi-batch drain equals the one-shot batch sketch table, replay of a
committed batch changes nothing (idempotent union + batch-id-gated
count), new batches accumulate."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.sketch_rollup import (
    build_distinct_sketches,
    rollup_distinct_sketches,
)
from sensorstream_scalable_sensor_data_pipeline_spark.streaming.sketches import (
    apply_sketch_batch,
    stream_sketch_maintain,
)

SCHEMA = "day string, event_type string, user_id long"

B0 = [("d1", "click", u) for u in range(40)] + [("d1", "view", u) for u in range(20)]
B1 = [("d1", "click", u) for u in range(20, 60)] + [("d2", "click", u) for u in range(10)]
B2 = [("d2", "view", u) for u in range(30)]


def _estimates(spark, path):
    t = spark.read.parquet(path)
    return {
        (r["day"], r["event_type"]): (r["approx_distinct"], r["n_rows"])
        for r in rollup_distinct_sketches(
            t.drop("last_batch_id"), ["day", "event_type"]
        ).collect()
    }


def test_stream_drain_equals_oneshot(spark, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, rows in enumerate([B0, B1, B2]):
        df = spark.createDataFrame(rows, SCHEMA)
        stage = str(tmp_path / f"c{i}")
        df.coalesce(1).write.parquet(stage)
        shutil.copy(
            glob.glob(os.path.join(stage, "part-*.parquet"))[0],
            os.path.join(landing, f"{i:03d}.parquet"),
        )
    phys = spark.read.parquet(landing).schema
    stream = (
        spark.readStream.schema(phys)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    table = str(tmp_path / "sketches")
    stream_sketch_maintain(
        spark, stream, table, ["day", "event_type"], "user_id", "day",
        checkpoint=str(tmp_path / "ckpt"),
    )
    got = _estimates(spark, table)
    oneshot = build_distinct_sketches(
        spark.createDataFrame(B0 + B1 + B2, SCHEMA), ["day", "event_type"], "user_id"
    )
    want = {
        (r["day"], r["event_type"]): (r["approx_distinct"], r["n_rows"])
        for r in rollup_distinct_sketches(oneshot, ["day", "event_type"]).collect()
    }
    assert got == want
    # small exact-mode sketches → estimates are the true distincts
    assert got[("d1", "click")] == (60, 80)  # 0..59 distinct, 80 rows
    assert got[("d2", "view")] == (30, 30)


def test_replay_of_committed_batch_is_noop(spark, tmp_path):
    table = str(tmp_path / "t")
    apply_sketch_batch(
        spark, table, spark.createDataFrame(B0, SCHEMA),
        ["day", "event_type"], "user_id", "day", batch_id=0,
    )
    apply_sketch_batch(
        spark, table, spark.createDataFrame(B1, SCHEMA),
        ["day", "event_type"], "user_id", "day", batch_id=1,
    )
    before = _estimates(spark, table)
    # at-least-once: batch 1 delivered AGAIN with the same id
    apply_sketch_batch(
        spark, table, spark.createDataFrame(B1, SCHEMA),
        ["day", "event_type"], "user_id", "day", batch_id=1,
    )
    assert _estimates(spark, table) == before  # estimate AND count stable
    # a genuinely new batch still accumulates
    apply_sketch_batch(
        spark, table, spark.createDataFrame(B2, SCHEMA),
        ["day", "event_type"], "user_id", "day", batch_id=2,
    )
    after = _estimates(spark, table)
    assert after[("d2", "view")] == (30, 30)
    assert after[("d1", "click")] == before[("d1", "click")]


def test_validation(spark, tmp_path):
    df = spark.createDataFrame(B0, SCHEMA)
    with pytest.raises(ValueError, match="one of group_cols"):
        apply_sketch_batch(
            spark, str(tmp_path / "x"), df, ["event_type"], "user_id",
            "day", batch_id=0,
        )
    with pytest.raises(ValueError, match="non-partition"):
        apply_sketch_batch(
            spark, str(tmp_path / "y"), df, ["day"], "user_id", "day",
            batch_id=0,
        )


def test_null_group_key_rejected(spark, tmp_path):
    """NULL group values would fall through every equi-join and break
    both replay guarantees — the sink rejects them with a clear
    contract error (review-found)."""
    rows = [("d1", None, 1), ("d1", "click", 2)]
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(ValueError, match="non-null"):
        apply_sketch_batch(
            spark, str(tmp_path / "t"), df, ["day", "event_type"],
            "user_id", "day", batch_id=0,
        )
