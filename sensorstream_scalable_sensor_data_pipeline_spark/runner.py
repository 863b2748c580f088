"""End-to-end pipeline runner (SURVEY §3.1 ``SensorDataPipeline.run``).

The reference's run() (main_pipeline.py:262-271) sequences: load
existing state → discover & extract new data since the cutoff →
enrich/filter/convert → per-sensor deduped ordered write → validate.
This runner is the same lifecycle, Spark-first:

* incremental cutoff from the materialized output (one MAX over the
  lookback partitions), extraction filter pushed into the scan;
* one declarative transform plan (broadcast enrich → integrity
  filter → schema-shaped series);
* idempotent merge (union + deterministic keyed dedup) and ONE
  partitioned write (``partitionBy(tagpath)``) instead of the
  reference's per-sensor loop of N filtered writes;
* read-back validation (S9).

Run it twice with the same inputs → byte-identical output (the
idempotency property test in tests/test_runner.py).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.config import PipelineConfig
from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup import (
    key_dedup_deterministic,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.enrich import enrich
from sensorstream_scalable_sensor_data_pipeline_spark.operators.filters import (
    integrity_filter,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.incremental import (
    compute_cutoff,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table
from sensorstream_scalable_sensor_data_pipeline_spark.sources.writers import (
    validate_output,
    write_partitioned,
)


def build_series(spark: SparkSession, cfg: PipelineConfig, cutoff: dt.datetime | None) -> DataFrame:
    """The transform plan: events≈SENSOR_RAW enriched by
    customer≈TAGS (FIXTURES.md mapping), integrity-filtered, shaped to
    the output schema. Entirely lazy; the cutoff filter pushes into
    the parquet scan."""
    if cutoff is not None:
        # Raw-column range load: the cutoff reaches parquet row-group
        # pruning (see sources/tables.py::load_events_range).
        from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
            load_events_range,
        )

        ev = load_events_range(spark, cfg.input_dir, low=cutoff)
    else:
        ev = load_table(spark, cfg.input_dir, "events")
    dim = load_table(spark, cfg.input_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("tagpath"),
    )
    if cfg.sensor_patterns:
        # P8: regex sensor selection, OR-fold — pushed as one filter on
        # the (broadcast) dim side, the idiomatic form of the
        # reference's collect-ids-then-IN (main_pipeline.py:343-350).
        from functools import reduce

        pred = reduce(
            lambda a, b: a | b,
            [F.col("tagpath").rlike(p) for p in cfg.sensor_patterns],
        )
        dim = dim.filter(pred)
        clean = integrity_filter(ev, "value")
        enriched = enrich(clean, dim, on="user_id", how="inner")
    else:
        clean = integrity_filter(ev, "value")
        enriched = enrich(clean, dim, on="user_id", how="left")
    return enriched.select(
        F.col("tagpath"),
        F.col("ts").alias("datetime"),
        F.col("value").alias("sensor_value"),
        F.col("user_id").alias("sensor_id"),
    )


def run_pipeline(
    spark: SparkSession,
    cfg: PipelineConfig,
    now: dt.datetime | None = None,
) -> dict:
    """Execute one incremental pipeline run; returns run stats."""
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    out_data = os.path.join(cfg.output_dir, "series")

    # 1. Cutoff from materialized state (A1/A4/X12).
    try:
        existing: DataFrame | None = spark.read.parquet(out_data)
    except Exception:
        existing = None
    cutoff = compute_cutoff(
        existing,
        "datetime",
        now,
        lookback_days=cfg.lookback_days,
        default_start=dt.datetime.strptime(cfg.default_start_date, "%Y-%m-%d"),
    )

    # 2-3. Extract + transform (one lazy plan).
    increment = build_series(spark, cfg, cutoff)

    # 4. Idempotent merge + single partitioned write. Overwrite mode
    # rewrites the full merged state. Append mode appends ONLY rows
    # whose (sensor_id, datetime) key is not already materialized —
    # the anti-join makes re-running the same increment a no-op (the
    # cutoff's lookback window re-extracts up to lookback_days of
    # already-written rows, so without the anti-join every append run
    # would duplicate them; the reference instead unions with existing
    # output and dedups before writing, main_pipeline.py:321-328).
    # Policy: for a key already materialized, the existing row wins —
    # history is immutable under append; overwrite applies keep="max".
    deduped = key_dedup_deterministic(
        increment, ["sensor_id", "datetime"], "sensor_value", keep="max"
    )
    if existing is not None and cfg.write_mode == "overwrite":
        deduped = key_dedup_deterministic(
            existing.unionByName(deduped),
            ["sensor_id", "datetime"],
            "sensor_value",
            keep="max",
        )
    elif existing is not None:
        from sensorstream_scalable_sensor_data_pipeline_spark.operators.enrich import (
            anti_filter,
        )

        # The existing key set is bounded by the lookback window: only
        # keys at/after the cutoff can collide with the increment, so
        # the anti-join's build side stays small at any history size.
        recent_keys = existing.filter(F.col("datetime") >= F.lit(cutoff)).select(
            "sensor_id", "datetime"
        )
        deduped = anti_filter(deduped, recent_keys, ["sensor_id", "datetime"])
    staging = out_data + "_staging" if cfg.write_mode == "overwrite" else out_data
    write_partitioned(
        deduped,
        staging,
        ["tagpath"],
        mode=cfg.write_mode,
        max_records_per_file=cfg.max_records_per_file,
    )
    if staging != out_data:
        # Atomic-ish swap so a failed overwrite never destroys state
        # (object stores: write to a new prefix + flip a pointer).
        # Crash-safe: clear any stale _old leftover from a run that
        # died between renames (else os.rename onto a non-empty dir
        # raises and wedges every subsequent run), and tolerate the
        # window where out_data never existed.
        import shutil

        tmp = out_data + "_old"
        shutil.rmtree(tmp, ignore_errors=True)
        if os.path.exists(out_data):
            os.rename(out_data, tmp)
        os.rename(staging, out_data)
        shutil.rmtree(tmp, ignore_errors=True)

    # 5. Validate (S9).
    n = validate_output(spark, out_data)
    return {"rows": n, "cutoff": cutoff.isoformat(), "output": out_data}
