"""Canonical loader for the driver's synthetic tables (TESTDATA.md).

Every query entry point loads inputs through ``load_table`` so that
per-table physical quirks are fixed exactly once. ``events.ts`` has
shipped in two physical forms across driver testdata generations, and
the loader normalizes BOTH to session-zone ``TIMESTAMP`` (LTZ):

* parquet TIMESTAMP(NANOS) — Spark has no ns type, so the session
  reads it as int64 nanoseconds
  (``spark.sql.legacy.parquet.nanosAsLong=true``, set by
  ``prepare_session``) and we convert with
  ``timestamp_micros(ts div 1000)``. The synthetic data is µs-aligned
  (verified: 0 rows with sub-µs precision), and integer ``div`` keeps
  the arithmetic exact where a double division would corrupt ns-scale
  epochs (~1.7e18 ≫ 2^53).
* parquet ``timestamp[us]`` with ``isAdjustedToUTC=false`` — Spark
  reads it as TIMESTAMP_NTZ, which the time functions the engine
  depends on (``unix_micros`` &c.) reject. The session timezone is
  pinned UTC, so ``cast('timestamp')`` reinterprets the wall-clock as
  the identical UTC instant.

DuckDB reads either form as naive-UTC µs timestamps, so oracle
comparisons stay bit-identical in both generations.

The ``events`` table plays the reference's SENSOR_RAW role
(FIXTURES.md §2): ts→t_stamp, user_id→tagid, value→value; ``customer``
plays TAGS (broadcast enrichment dim, main_pipeline.py:196).

Scale note: these are plain parquet scans with explicit column set —
Catalyst pushes filters and prunes columns into the scan
(``PushedFilters`` / ``ReadSchema``), which is the whole game at
100 TB. Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.session import prepare_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-zone TIMESTAMP from
    any physical form the testdata has shipped in (module docstring):
    int64 nanoseconds or TIMESTAMP_NTZ. Already-LTZ frames pass
    through untouched."""
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        # ns-epoch int64 → TIMESTAMP, exact for µs-aligned data.
        # Backtick-quoted: the name is caller-supplied (r7 verdict #4).
        from sensorstream_scalable_sensor_data_pipeline_spark.functions.identifiers import (
            quote_ident,
        )

        return df.withColumn(
            col, F.expr(f"timestamp_micros({quote_ident(col)} div 1000)")
        )
    if dt == "timestamp_ntz":
        # UTC session: same wall-clock, same instant.
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, normalizing physical-type quirks."""
    prepare_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_events_range(
    spark: SparkSession,
    sf_dir: str,
    low=None,
    high=None,
) -> DataFrame:
    """Events with a time-range predicate applied to the RAW int64
    nanosecond column *before* the timestamp conversion.

    Filtering after the conversion wraps ``ts`` in
    ``timestamp_micros(...)`` and Catalyst can then push only
    ``IsNotNull`` into the scan (verified via .explain — the range
    comparison stays in a post-scan Filter). Comparing the raw long
    against a pre-converted nanosecond literal pushes the real
    bounds into parquet row-group min/max pruning — at 100 TB with
    time-sorted row groups that is the difference between scanning a
    week and scanning years. [low, high): same bounds semantics as
    ``operators/filters.py::range_filter``.
    """
    import datetime as dt

    prepare_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    raw = dict(df.dtypes).get("ts") == "bigint"

    def _ns(t: dt.datetime) -> int:
        # Integer epoch math: float .timestamp() has ~0.2µs resolution
        # at 2024 epochs, which can land a bound 1µs off and shift the
        # [low, high) boundary (ADVICE r1).
        import calendar

        return (
            calendar.timegm(t.timetuple()) * 1_000_000 + t.microsecond
        ) * 1_000

    if raw:
        if low is not None:
            df = df.filter(F.col("ts") >= F.lit(_ns(low)))
        if high is not None:
            df = df.filter(F.col("ts") < F.lit(_ns(high)))
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if dict(df.dtypes).get("ts") == "timestamp_ntz":
        # Compare against an NTZ literal so the predicate pushes into
        # the scan AS an NTZ comparison (casting the column first
        # would strand the filter above the scan); UTC session makes
        # the wall-clock literal the same instant.
        if low is not None:
            df = df.filter(F.col("ts") >= F.lit(low).cast("timestamp_ntz"))
        if high is not None:
            df = df.filter(F.col("ts") < F.lit(high).cast("timestamp_ntz"))
        return normalize_event_ts(df)
    if low is not None:
        df = df.filter(F.col("ts") >= F.lit(low))
    if high is not None:
        df = df.filter(F.col("ts") < F.lit(high))
    return df


def widen_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Input-parallelism hatch for under-split scans feeding heavy
    per-row compute (optimization guide §2.5 "input skew: one huge
    unsplittable file … repartition immediately after the read").

    The driver's synthetic tables ship as ONE parquet file with ONE
    row group each, so every scan is a single task and all scan-side
    compute before the first Exchange — tokenization, shingling,
    per-row hashing, explode amplification, per-pair scoring under a
    broadcast join — runs on one core of the whole machine. This
    round-robins the scan output across ``min_parts`` (default
    ``sparkContext.defaultParallelism``) partitions, but ONLY when the
    scan provides fewer: at production scale the input is many files
    and the hatch is a no-op, so nothing here is tuned to local mode.

    Use it where the downstream per-row work dominates the one extra
    small shuffle it introduces (the base tables are ≤ a few MB; at
    100 TB the condition is false and no payload bytes move). Results
    are unchanged by construction — every consumer in this engine is
    partition-order independent (the repo-wide grid/struct-max/min-by
    doctrine), and round-robin repartition is deterministic under
    retries (``spark.sql.execution.sortBeforeRepartition`` default).
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
