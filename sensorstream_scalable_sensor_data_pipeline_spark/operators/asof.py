"""Temporal joins (§2.12 custom operators — Spark has no native ones):
as-of join and bucketed range join.

The classic time-series enrichment the reference's domain wants but
its engine lacks: for every sensor reading at time t, attach the most
recent state row (calibration, configuration, tag revision) at or
before t. SQL engines with native support call it ASOF JOIN (DuckDB,
QuestDB, kdb); Spark must compose it.

Implementation — the union + ordered-window trick, one shuffle total:

1. union the two sides with an ``is_right`` marker (left columns null
   on right rows and vice versa);
2. one window partitioned by key, ordered by (t, is_right DESC) so at
   equal timestamps the state row precedes the readings it governs;
3. ``last(state_col, ignorenulls=True)`` carries the latest state
   forward onto every row;
4. keep only left rows.

Scale shape: ONE hash-partitioned sort per key — the same cost as any
keyed window — versus the naive inequality join, which is a range
join that degenerates to per-key cross products. No broadcast
requirement on either side; skewed keys split under AQE like any
window shuffle. The oracle twin is DuckDB's native ``ASOF LEFT JOIN``
— native semantics pin ours exactly (inclusive ≤, null when no state
precedes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row gains, for each of
    ``right``'s ``value_cols``, the value from the latest right row
    with the same ``on`` key and ``time_col`` ≤ the left row's
    (inclusive). Rows with no preceding state keep nulls.

    ``right`` must be unique per (key, time); duplicate state rows at
    the same instant are resolved deterministically (max value wins)
    before the join so results never depend on physical row order.
    """
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup import (
        key_dedup_deterministic,
    )

    r = key_dedup_deterministic(
        right.select(on, time_col, *value_cols), [on, time_col], value_cols[0], keep="max"
    )
    l_cols = [c for c in left.columns]
    tagged_l = left.withColumn("_is_r", F.lit(0))
    for c in value_cols:
        tagged_l = tagged_l.withColumn(c, F.lit(None).cast(dict(r.dtypes)[c]))
    tagged_r = r.withColumn("_is_r", F.lit(1))
    for c in l_cols:
        if c not in (on, time_col) and c not in value_cols:
            tagged_r = tagged_r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = tagged_l.unionByName(tagged_r.select(*tagged_l.columns))
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(time_col).asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u
    for c in value_cols:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return carried.filter(F.col("_is_r") == 0).select(*l_cols, *value_cols)


def resample_locf(
    readings: DataFrame,
    on: str,
    time_col: str,
    value_cols: list[str],
    step_seconds: int,
) -> DataFrame:
    """Resample irregular per-key readings onto a regular grid with
    last-observation-carried-forward — the gap-fill every sensor
    dashboard and feature pipeline needs (TimescaleDB's
    ``time_bucket_gapfill`` + ``locf``).

    Composition, not new machinery: each key's grid is a ``sequence``
    from its first reading's step-aligned floor to its last reading
    (one tiny agg + explode — grid rows ≈ span/step per key), then one
    :func:`asof_join` attaches the latest reading at or before every
    grid instant. Grid points before the first reading (at most one,
    the aligned floor) carry nulls.
    """
    step = F.lit(step_seconds)
    bounds = readings.groupBy(on).agg(
        F.min(time_col).alias("_mn"), F.max(time_col).alias("_mx")
    )
    aligned = F.expr(
        f"timestamp_seconds((unix_micros(_mn) div 1000000 div {step_seconds})"
        f" * {step_seconds})"
    )
    grid = bounds.select(
        on,
        F.explode(
            F.sequence(
                aligned, F.col("_mx"), F.expr(f"INTERVAL {step_seconds} SECONDS")
            )
        ).alias(time_col),
    )
    return asof_join(
        grid, readings.select(on, time_col, *value_cols), on, time_col, value_cols
    )


def rate_of_change(
    readings: DataFrame,
    on: str,
    time_col: str,
    value_col: str,
    out: str = "rate_per_s",
) -> DataFrame:
    """Per-key first derivative: (value − lag(value)) / seconds since
    the previous reading — the sensor-domain staple (leak detection,
    ramp alarms). One keyed window; the first reading per key and any
    zero-interval repeat yield NULL rather than ±Infinity (Spark's
    ANSI double division and DuckDB disagree on x/0, so the guard is
    also what keeps the operator oracle-checkable)."""
    w = Window.partitionBy(on).orderBy(time_col)
    dv = F.col(value_col) - F.lag(value_col).over(w)
    dt_us = F.unix_micros(F.col(time_col)) - F.unix_micros(F.lag(time_col).over(w))
    return readings.withColumn(
        out,
        F.when(dt_us > 0, dv / (dt_us.cast("double") / F.lit(1_000_000.0))),
    )


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    on: str,
    time_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner containment join: every ``left`` row paired with every
    interval of the same key whose ``[start, end]`` (inclusive)
    contains its timestamp — readings → maintenance windows, events →
    sessions, prices → validity ranges.

    Expressed naively this is an inequality join, which Spark plans as
    a nested-loop / per-key cross product. The scalable form buckets
    time: points key on their bucket, intervals EXPLODE to every
    bucket they cover, and the join becomes an ordinary equi-join on
    (key, bucket) followed by the exact containment filter. Each point
    lives in exactly one bucket, so no dedup is needed; interval
    fan-out is ceil(len/bucket) + 1 rows — pick ``bucket_seconds``
    near the typical interval length so fan-out stays ~2×.
    """
    us = 1_000_000 * bucket_seconds
    lb = left.withColumn(
        "_b", F.floor(F.unix_micros(F.col(time_col)) / F.lit(us))
    )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / F.lit(us)),
                F.floor(F.unix_micros(F.col(end_col)) / F.lit(us)),
            )
        ),
    )
    return (
        lb.join(iv, [on, "_b"])
        .filter(
            (F.col(time_col) >= F.col(start_col))
            & (F.col(time_col) <= F.col(end_col))
        )
        .drop("_b")
    )
