"""Statistical aggregates: per-key trends and correlation matrices
(§2.12 analytics breadth — the monitoring questions after the
anomaly flags: "is this sensor DRIFTING?", "which signals move
together?").

* :func:`trend_per_key` — per-key least-squares slope of value over
  time (``regr_slope``/``regr_intercept``/``regr_r2`` — Catalyst
  aggregates since Spark 3.3): sensor drift in units/second from ONE
  map-side-combined aggregate pass. The gradual-degradation signal a
  z-score cannot see (a slow drift never spikes). The
  ``min_points`` gate counts COMPLETE (time, value) pairs
  (``regr_count``) — rows the fit actually used, not raw rows.
* :func:`corr_matrix` — pairwise Pearson correlation over N columns
  in ONE aggregate pass (the profile_numeric discipline: never one
  job per pair), long-format output (col_a, col_b, corr, n).
  PAIRWISE-COMPLETE semantics throughout: every moment — covariance,
  BOTH standard deviations, and the reported ``n`` — is computed
  over rows where both columns are non-null, matching Spark's and
  DuckDB's native ``corr`` (per-column stddevs over each column's
  own non-null rows would silently disagree with them whenever data
  has holes).

NUMERIC HONESTY: unlike the engine's grid-exact sums, covariance
aggregates are plain double moments — partition-order ulp drift is
inherent to Spark's own implementation, so local oracles compare at
1e-9 relative tolerance, not by hash (the ln-tolerance doctrine).
Fixing them to the grid would change the semantics users expect from
``regr_*``/``corr``; documented trade, not an accident.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trend_per_key(
    readings: DataFrame,
    on: str,
    time_col: str,
    value_col: str,
    min_points: int = 3,
) -> DataFrame:
    """(key, n, slope_per_s, intercept, r2, t_start, t_end): the OLS
    fit of ``value_col`` against epoch-seconds per key. ``n`` is the
    complete-pair count the fit used. Keys with fewer than
    ``min_points`` complete pairs (or zero time variance —
    all-simultaneous readings) return NULL fit fields rather than
    dropping out: the report stays complete, the alert filters on
    ``slope_per_s IS NOT NULL``."""
    t = F.unix_micros(F.col(time_col)).cast("double") / F.lit(1_000_000.0)
    v = F.col(value_col).cast("double")
    agg = readings.groupBy(on).agg(
        F.regr_count(v, t).alias("n"),
        F.regr_slope(v, t).alias("_slope"),
        F.regr_intercept(v, t).alias("_icept"),
        F.regr_r2(v, t).alias("_r2"),
        F.min(time_col).alias("t_start"),
        F.max(time_col).alias("t_end"),
    )
    ok = F.col("n") >= int(min_points)
    return agg.select(
        on,
        "n",
        F.when(ok, F.col("_slope")).alias("slope_per_s"),
        F.when(ok, F.col("_icept")).alias("intercept"),
        F.when(ok, F.col("_r2")).alias("r2"),
        "t_start",
        "t_end",
    )


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format Pearson correlation matrix over ``cols``: one row
    per unordered pair (col_a < col_b by list order) — (col_a, col_b,
    corr, n) with ``n`` the pair's complete-row count. ONE aggregate
    pass computes every pair; ``corr`` is NULL when either side is
    constant over the complete rows (zero variance) — via guarded
    moments, because ANSI-mode ``corr`` raises divide-by-zero there
    instead of returning NULL (found by test)."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    if len(set(cols)) != len(cols):
        raise ValueError("duplicate columns")
    pairs = list(combinations(cols, 2))
    aggs = []
    for i, (a, b) in enumerate(pairs):
        ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
        both = ca.isNotNull() & cb.isNotNull()
        # pairwise-complete masking: stddevs and counts must use the
        # SAME row set as the covariance (which skips incomplete pairs
        # natively) or the ratio is not Pearson r (review-found: a
        # lone value opposite a NULL inflated one stddev and broke
        # parity with native corr)
        ma, mb = F.when(both, ca), F.when(both, cb)
        sa, sb = F.stddev_samp(ma), F.stddev_samp(mb)
        aggs.append(
            F.when(
                (sa > 0) & (sb > 0), F.covar_samp(ca, cb) / (sa * sb)
            ).alias(f"_c{i}")
        )
        aggs.append(F.count(ma).alias(f"_n{i}"))
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (a, b, row[f"_c{i}"], row[f"_n{i}"])
        for i, (a, b) in enumerate(pairs)
    ]
    from sensorstream_scalable_sensor_data_pipeline_spark.functions.localframe import (
        tiny_local_frame,
    )

    return tiny_local_frame(
        spark, out, "col_a string, col_b string, corr double, n long"
    )
