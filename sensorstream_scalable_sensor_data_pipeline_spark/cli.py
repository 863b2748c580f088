"""CLI entry point (SURVEY §3.3 — the reference's ``spark-submit``
surface).

The reference runs as::

    spark-submit --master local[*] src/pipeline.py \
        --config-source file --config-path config/pipeline_config.json

(README.md:104-110; EC2 variant with ``--config-source aws`` at Param
PDF p.4 §4C). The same surface here::

    spark-submit cli.py --config-source file --config-path cfg.json
    python -m sensorstream_scalable_sensor_data_pipeline_spark.cli \
        --config-source file --config-path cfg.json [--run-date 2024-05-01]

Flags override config-file values (the reference's kwargs-over-config
priority, main_pipeline.py:361-370). The run executes under the full
DAG contract (``schedule.scheduled_run``): run lock, retries with
backoff, and the 1st-of-month append/overwrite switch — pass
``--write-mode`` to pin a mode instead. Exit code 0 on success; the
run stats print as one JSON line (machine-consumable, like bench.py).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sensorstream-pipeline",
        description="Incremental sensor-series pipeline (Spark-first engine)",
    )
    p.add_argument(
        "--config-source",
        choices=("file", "dict", "airflow", "aws"),
        default="file",
        help="config provenance (reference priority chain, SURVEY §3.1)",
    )
    p.add_argument("--config-path", help="JSON config path for --config-source file")
    p.add_argument("--input-dir", help="override: input tables directory")
    p.add_argument("--output-dir", help="override: output root")
    p.add_argument(
        "--write-mode",
        choices=("overwrite", "append"),
        help="pin the write mode (default: date switch — append on the 1st)",
    )
    p.add_argument(
        "--run-date",
        help="logical run date YYYY-MM-DD (default: today; drives the mode switch)",
    )
    p.add_argument("--retries", type=int, default=3, help="DAG retries (default 3)")
    p.add_argument(
        "--master",
        default="local[*]",
        help="Spark master when the CLI builds the session (default local[*])",
    )
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    """Run one scheduled pipeline execution; returns the exit code.

    ``spark`` is injectable for tests; by default the CLI builds the
    engine session (AQE + skew handling + UTC, session.py).
    """
    args = build_parser().parse_args(argv)
    from sensorstream_scalable_sensor_data_pipeline_spark.config import load_config
    from sensorstream_scalable_sensor_data_pipeline_spark.schedule import scheduled_run

    overrides = {
        k: v
        for k, v in (
            ("input_dir", args.input_dir),
            ("output_dir", args.output_dir),
            ("write_mode", args.write_mode),
        )
        if v is not None
    }
    cfg = load_config(args.config_source, args.config_path, **overrides)
    run_date = (
        dt.datetime.strptime(args.run_date, "%Y-%m-%d").date()
        if args.run_date
        else None
    )
    if spark is None:
        from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

        spark = get_spark(app_name="sensorstream-pipeline", master=args.master)
    stats = scheduled_run(
        spark,
        cfg,
        run_date=run_date,
        retries=args.retries,
        write_mode=args.write_mode,  # pinned mode overrides the date switch
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
