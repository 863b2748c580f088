"""Incremental batch state (M4; SURVEY §2.10 hand-rolled streaming, X12).

The reference processes incrementally: each daily run computes a
cutoff = min(max(datetime already materialized), now − lookback_days)
(``_get_cutoff_date``, main_pipeline.py:331-341; lookback_days=30,
main_pipeline.py:36), re-extracts only rows at/after the cutoff
(main_pipeline.py:296-300), and makes re-ingest idempotent with
``dropDuplicates(["datetime"])`` before writing
(main_pipeline.py:328). That triad is exactly Structured Streaming's
watermark + dedup-state + append; the native streaming face lives in
``streaming/pipeline.py``. This module is the batch face.

Scale note: ``compute_cutoff`` is one MAX aggregation — with
(year, month) partitioned state it prunes to the latest partitions;
the re-extract filter pushes to the source (X8), so a daily increment
scans days, not history. The merge is a union + one keyed dedup
shuffle over (increment + affected history), not over all history, if
the caller pre-filters history to the lookback window — at 100 TB
that bounding is the difference between a 30-day job and a full-table
job.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup import (
    key_dedup_deterministic,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.setops import union_by_name_fold

DEFAULT_LOOKBACK_DAYS = 30  # main_pipeline.py:36


def partition_months_pred(
    since: dt.datetime, year_col: str = "year", month_col: str = "month"
) -> F.Column:
    """Predicate selecting the ``(year, month)`` partitions at/after
    ``since``'s month — the Spark-native form of the reference's
    month-table name pruning (``filter_tables``,
    main_pipeline.py:179-187): expressed on real partition columns, it
    becomes a Catalyst PartitionFilter and the scan never lists, let
    alone reads, older months."""
    return (F.col(year_col) > since.year) | (
        (F.col(year_col) == since.year) & (F.col(month_col) >= since.month)
    )


def compute_cutoff_pruned(
    materialized: DataFrame | None,
    time_col: str,
    now: dt.datetime,
    lookback_days: int = DEFAULT_LOOKBACK_DAYS,
    default_start: dt.datetime | None = None,
) -> dt.datetime:
    """:func:`compute_cutoff` for (year, month)-partitioned state: the
    MAX runs over the lookback months only (partition-pruned scan, not
    an O(history) pass). cutoff = min(max, now − lookback) can only
    exceed the lookback floor when data exists in the floor's month or
    later, so pruning to those months is exact; if they are empty
    (stale history — the bootstrap/catch-up path), one full-history
    MAX recovers the true, earlier cutoff."""
    lookback_floor = now - dt.timedelta(days=lookback_days)
    if materialized is None:
        return default_start or lookback_floor
    pruned = materialized.filter(partition_months_pred(lookback_floor))
    row = pruned.agg(F.max(time_col).alias("m")).collect()[0]
    if row["m"] is None:
        row = materialized.agg(F.max(time_col).alias("m")).collect()[0]
        if row["m"] is None:
            return default_start or lookback_floor
    return min(row["m"], lookback_floor)


def compute_cutoff(
    materialized: DataFrame | None,
    time_col: str,
    now: dt.datetime,
    lookback_days: int = DEFAULT_LOOKBACK_DAYS,
    default_start: dt.datetime | None = None,
) -> dt.datetime:
    """A1/A4/X12: cutoff = min(max(materialized time), now − lookback).

    ``default_start`` (reference default 2024-01-01,
    main_pipeline.py:37) applies when nothing is materialized yet.
    """
    lookback_floor = now - dt.timedelta(days=lookback_days)
    if materialized is None:
        return default_start or lookback_floor
    row = materialized.agg(F.max(time_col).alias("m")).collect()[0]
    if row["m"] is None:
        return default_start or lookback_floor
    return min(row["m"], lookback_floor)


def incremental_merge(
    history: DataFrame | None,
    increment: DataFrame,
    keys: list[str],
    order_col: str,
) -> DataFrame:
    """X11/U2/D1: idempotent merge of an increment into history.

    union + deterministic keyed dedup (newest wins on re-ingest).
    Running the same increment twice yields a byte-identical result —
    the reference's idempotency contract (main_pipeline.py:328).
    """
    frames = [increment] if history is None else [history, increment]
    return key_dedup_deterministic(union_by_name_fold(frames), keys, order_col, keep="max")
