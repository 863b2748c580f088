"""Scheduler-analog tests: run lock (max_active_runs=1), retry with
backoff, 1st-of-month write-mode switch, end-to-end scheduled run."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from sensorstream_scalable_sensor_data_pipeline_spark.config import PipelineConfig
from sensorstream_scalable_sensor_data_pipeline_spark.schedule import (
    RunLock,
    RunLockHeld,
    retry,
    scheduled_run,
    write_mode_for,
)


def test_write_mode_switch():
    assert write_mode_for(dt.date(2024, 3, 1)) == "append"
    assert write_mode_for(dt.date(2024, 3, 2)) == "overwrite"
    assert write_mode_for(dt.date(2024, 12, 31)) == "overwrite"


def test_run_lock_exclusive(tmp_path):
    lock_dir = str(tmp_path / "lock")
    with RunLock(lock_dir):
        assert os.path.isdir(lock_dir)
        with pytest.raises(RunLockHeld, match="max_active_runs"):
            with RunLock(lock_dir):
                pass
    assert not os.path.exists(lock_dir)  # released


def test_run_lock_stale_takeover(tmp_path):
    lock_dir = str(tmp_path / "lock")
    os.makedirs(lock_dir)
    old = dt.datetime.now().timestamp() - 3 * 3600
    os.utime(lock_dir, (old, old))
    with RunLock(lock_dir, stale_after_s=2 * 3600):  # presumed-dead run
        assert os.path.isdir(lock_dir)


def test_run_lock_stale_takeover_single_winner(tmp_path):
    """The takeover race: many concurrent starters all observe the
    same stale lock; exactly ONE may win (the old utime-based takeover
    let every observer proceed — double-run under max_active_runs=1)."""
    import threading

    lock_dir = str(tmp_path / "lock")
    os.makedirs(lock_dir)
    old = dt.datetime.now().timestamp() - 3 * 3600
    os.utime(lock_dir, (old, old))

    n = 8
    barrier = threading.Barrier(n)
    release = threading.Event()
    results = []

    def contender():
        lock = RunLock(lock_dir, stale_after_s=2 * 3600)
        barrier.wait()
        try:
            with lock:
                results.append("won")  # recorded BEFORE blocking, so
                release.wait(timeout=10)  # main can await all n reports
        except RunLockHeld:
            results.append("held")

    threads = [threading.Thread(target=contender) for _ in range(n)]
    for t in threads:
        t.start()
    # Wait for ALL contenders to report before releasing the winner:
    # releasing after n-1 reports let the winner exit while a straggler
    # was still contending — it then acquired the freed lock
    # sequentially, which is correct lock behavior but looked like a
    # double win to the assertion.
    deadline = dt.datetime.now().timestamp() + 15
    while len(results) < n and dt.datetime.now().timestamp() < deadline:
        pass
    release.set()
    for t in threads:
        t.join(timeout=15)
    assert results.count("won") == 1, results
    assert results.count("held") == n - 1, results
    assert not os.path.exists(lock_dir)  # winner released cleanly


def test_run_lock_reaped_holder_cannot_release_new_lock(tmp_path):
    """A holder that was reaped for staleness must not delete the NEW
    holder's lock on exit (ownership token check)."""
    lock_dir = str(tmp_path / "lock")
    a = RunLock(lock_dir, stale_after_s=2 * 3600)
    a.__enter__()
    # a's run overshoots its timeout; b legitimately takes over
    old = dt.datetime.now().timestamp() - 3 * 3600
    os.utime(lock_dir, (old, old))
    b = RunLock(lock_dir, stale_after_s=2 * 3600)
    b.__enter__()
    # the zombie finishes and releases — b's lock must survive
    a.__exit__(None, None, None)
    assert os.path.isdir(lock_dir)
    with pytest.raises(RunLockHeld):
        with RunLock(lock_dir, stale_after_s=2 * 3600):
            pass
    b.__exit__(None, None, None)
    assert not os.path.exists(lock_dir)


def test_retry_recovers_and_gives_up():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert retry(flaky, retries=3) == "ok"
    assert calls["n"] == 3

    def always_fails():
        raise RuntimeError("fatal")

    with pytest.raises(RuntimeError, match="fatal"):
        retry(always_fails, retries=2)


def test_retry_does_not_retry_lock_held():
    calls = {"n": 0}

    def locked():
        calls["n"] += 1
        raise RunLockHeld("held")

    with pytest.raises(RunLockHeld):
        retry(locked, retries=3)
    assert calls["n"] == 1


def test_scheduled_run_injected(tmp_path):
    cfg = PipelineConfig(input_dir="/in", output_dir=str(tmp_path / "out"))
    seen = {}

    def fake_run(spark, c):
        seen["mode"] = c.write_mode
        return {"rows": 7}

    stats = scheduled_run(
        None, cfg, run_date=dt.date(2024, 5, 1), run_fn=fake_run
    )
    assert seen["mode"] == "append"
    assert stats["rows"] == 7 and stats["write_mode"] == "append"
    # lock released after the run
    assert not os.path.exists(os.path.join(cfg.output_dir, "_run_lock"))


def test_scheduled_run_end_to_end(spark, sf_dir, tmp_path):
    """Mid-month (overwrite) then 1st-of-month (append) against the
    real runner: the DAG's monthly cadence in miniature, idempotent
    across the mode switch."""
    cfg = PipelineConfig(input_dir=sf_dir, output_dir=str(tmp_path / "out"))
    r1 = scheduled_run(spark, cfg, run_date=dt.date(2024, 5, 15))
    assert r1["write_mode"] == "overwrite" and r1["rows"] > 0
    r2 = scheduled_run(spark, cfg, run_date=dt.date(2024, 6, 1))
    assert r2["write_mode"] == "append"
    out = spark.read.parquet(r1["output"])
    assert out.count() == r1["rows"]  # append of same inputs added nothing


def test_kafka_read_options():
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.readers import (
        kafka_read_options,
    )

    opts = kafka_read_options("broker:9092", ["sensors.raw", "sensors.late"])
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "sensors.raw,sensors.late"
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "true"
    assert opts["maxOffsetsPerTrigger"] == "100000"
    no_cap = kafka_read_options("b:9092", "t", max_offsets_per_trigger=None)
    assert "maxOffsetsPerTrigger" not in no_cap
