"""End-to-end runner tests: config validation, incremental runs,
idempotency (re-run ⇒ identical output), regex sensor selection."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.config import (
    PipelineConfig,
    from_dict,
    load_config,
)
from sensorstream_scalable_sensor_data_pipeline_spark.runner import run_pipeline


def _snapshot(spark, path):
    df = spark.read.parquet(path)
    return sorted(map(tuple, df.collect()))


def test_config_validation():
    with pytest.raises(ValueError, match="write_mode"):
        PipelineConfig(input_dir="x", output_dir="y", write_mode="upsert")
    with pytest.raises(ValueError, match="lookback_days"):
        PipelineConfig(input_dir="x", output_dir="y", lookback_days=0)
    with pytest.raises(ValueError, match="unknown config keys"):
        from_dict({"input_dir": "x", "output_dir": "y", "bogus": 1})


def test_load_config_file_and_gated_sources(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"input_dir": "/in", "output_dir": "/out", "lookback_days": 7}))
    cfg = load_config("file", str(p), write_mode="append")
    assert (cfg.lookback_days, cfg.write_mode) == (7, "append")
    with pytest.raises(RuntimeError, match="airflow"):
        load_config("airflow")


def test_run_pipeline_idempotent(spark, sf_dir, tmp_path):
    cfg = PipelineConfig(input_dir=sf_dir, output_dir=str(tmp_path / "out"))
    r1 = run_pipeline(spark, cfg)
    s1 = _snapshot(spark, r1["output"])
    assert r1["rows"] == len(s1) > 0
    # re-run over the same inputs: merged+deduped state is unchanged
    r2 = run_pipeline(spark, cfg)
    s2 = _snapshot(spark, r2["output"])
    assert s1 == s2


def test_run_pipeline_idempotent_append(spark, sf_dir, tmp_path):
    """Append mode must not duplicate rows on re-run: the lookback
    window re-extracts already-materialized rows, and the anti-join
    against recent materialized keys must drop them (ADVICE r1 high)."""
    cfg = PipelineConfig(
        input_dir=sf_dir, output_dir=str(tmp_path / "out"), write_mode="append"
    )
    r1 = run_pipeline(spark, cfg)
    s1 = _snapshot(spark, r1["output"])
    assert r1["rows"] == len(s1) > 0
    r2 = run_pipeline(spark, cfg)
    s2 = _snapshot(spark, r2["output"])
    assert s1 == s2
    r3 = run_pipeline(spark, cfg)
    assert _snapshot(spark, r3["output"]) == s1


def test_run_pipeline_recovers_from_stale_old_dir(spark, sf_dir, tmp_path):
    """A run that died between the overwrite swap renames leaves
    '<out>_old' behind; the next run must clear it and proceed."""
    import os

    cfg = PipelineConfig(input_dir=sf_dir, output_dir=str(tmp_path / "out"))
    r1 = run_pipeline(spark, cfg)
    s1 = _snapshot(spark, r1["output"])
    stale = r1["output"] + "_old"
    os.makedirs(os.path.join(stale, "junk"))  # non-empty stale dir
    r2 = run_pipeline(spark, cfg)
    assert _snapshot(spark, r2["output"]) == s1
    assert not os.path.exists(stale)


def test_run_pipeline_pattern_selection(spark, sf_dir, tmp_path):
    cfg = PipelineConfig(
        input_dir=sf_dir,
        output_dir=str(tmp_path / "sel"),
        sensor_patterns=("^BUIL", "MACH"),
    )
    run_pipeline(spark, cfg)
    out = spark.read.parquet(str(tmp_path / "sel" / "series"))
    tags = {r["tagpath"] for r in out.select("tagpath").distinct().collect()}
    assert tags == {"BUILDING", "MACHINERY"}
