"""CLI entry point (SURVEY §3.3 spark-submit surface): config-file
run under the DAG contract, flag overrides, mode pinning."""

from __future__ import annotations

import json

import pytest

from sensorstream_scalable_sensor_data_pipeline_spark.cli import build_parser, main


def _write_cfg(tmp_path, sf_dir, out_name="out"):
    p = tmp_path / "cfg.json"
    p.write_text(
        json.dumps(
            {"input_dir": sf_dir, "output_dir": str(tmp_path / out_name)}
        )
    )
    return str(p)


def test_cli_file_config_end_to_end(spark, sf_dir, tmp_path, capsys):
    cfg_path = _write_cfg(tmp_path, sf_dir)
    rc = main(
        [
            "--config-source",
            "file",
            "--config-path",
            cfg_path,
            "--run-date",
            "2024-05-15",
        ],
        spark=spark,
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] > 0
    assert stats["write_mode"] == "overwrite"  # mid-month => date switch
    assert spark.read.parquet(stats["output"]).count() == stats["rows"]


def test_cli_overrides_and_mode_pin(spark, sf_dir, tmp_path, capsys):
    cfg_path = _write_cfg(tmp_path, sf_dir)
    rc = main(
        [
            "--config-path",
            cfg_path,
            "--output-dir",
            str(tmp_path / "other"),
            "--write-mode",
            "append",
            "--run-date",
            "2024-05-15",  # date switch says overwrite; pin wins
        ],
        spark=spark,
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["write_mode"] == "append"
    assert stats["output"].startswith(str(tmp_path / "other"))


def test_cli_parser_rejects_unknown_mode():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--write-mode", "upsert"])
