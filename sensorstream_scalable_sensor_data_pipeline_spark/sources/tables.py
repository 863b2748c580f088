"""Canonical loader for the driver's synthetic tables (TESTDATA.md).

Every query entry point loads inputs through ``load_table`` so that
per-table physical quirks are fixed exactly once:

* ``events.ts`` is parquet TIMESTAMP(NANOS) — Spark has no ns type, so
  the session reads it as int64 nanoseconds
  (``spark.sql.legacy.parquet.nanosAsLong=true``, set by
  ``prepare_session``) and we convert with
  ``timestamp_micros(ts div 1000)``. The synthetic data is µs-aligned
  (verified: 0 rows with sub-µs precision), and integer ``div`` keeps
  the arithmetic exact where a double division would corrupt ns-scale
  epochs (~1.7e18 ≫ 2^53). DuckDB performs the same ns→µs narrowing,
  so oracle comparisons are bit-identical.

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, normalizing physical-type quirks."""
    prepare_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns-epoch int64 → TIMESTAMP, exact for µs-aligned data.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
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
    if low is not None:
        df = df.filter(F.col("ts") >= F.lit(low))
    if high is not None:
        df = df.filter(F.col("ts") < F.lit(high))
    return df
