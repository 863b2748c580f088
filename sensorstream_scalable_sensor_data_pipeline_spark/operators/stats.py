"""Statistical aggregates: per-key trends and correlation matrices
(§2.12 analytics breadth — the monitoring questions after the
anomaly flags: "is this sensor DRIFTING?", "which signals move
together?").

* :func:`trend_per_key` — per-key least-squares slope of value over
  time (``regr_slope``/``regr_intercept``/``regr_r2`` — Catalyst
  aggregates since Spark 3.3): sensor drift in units/second from ONE
  map-side-combined aggregate pass. The gradual-degradation signal a
  z-score cannot see (a slow drift never spikes).
* :func:`corr_matrix` — pairwise Pearson correlation over N columns
  in ONE aggregate pass (N·(N−1)/2 ``corr`` expressions — the
  profile_numeric discipline: never one job per pair), long-format
  output (col_a, col_b, corr, n).

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
    fit of ``value_col`` against epoch-seconds per key. Keys with
    fewer than ``min_points`` readings (or zero time variance —
    all-simultaneous readings) return NULL fit fields rather than
    dropping out: the report stays complete, the alert filters on
    ``slope_per_s IS NOT NULL``."""
    t = F.unix_micros(F.col(time_col)).cast("double") / F.lit(1_000_000.0)
    v = F.col(value_col).cast("double")
    agg = readings.groupBy(on).agg(
        F.count(v).alias("n"),
        F.expr(
            f"regr_slope(CAST({value_col} AS DOUBLE), "
            f"CAST(unix_micros({time_col}) AS DOUBLE) / 1000000.0)"
        ).alias("_slope"),
        F.expr(
            f"regr_intercept(CAST({value_col} AS DOUBLE), "
            f"CAST(unix_micros({time_col}) AS DOUBLE) / 1000000.0)"
        ).alias("_icept"),
        F.expr(
            f"regr_r2(CAST({value_col} AS DOUBLE), "
            f"CAST(unix_micros({time_col}) AS DOUBLE) / 1000000.0)"
        ).alias("_r2"),
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
    corr, n). ONE aggregate pass computes every pair; ``corr`` is
    NULL when either side is constant (zero variance) — restored via
    guarded moments because ANSI-mode ``corr`` raises instead."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    if len(set(cols)) != len(cols):
        raise ValueError("duplicate columns")
    pairs = list(combinations(cols, 2))
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (a, b) in enumerate(pairs):
        ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
        sa, sb = F.stddev_samp(ca), F.stddev_samp(cb)
        # corr from guarded moments: the session runs ANSI mode, where
        # Spark's corr() raises divide-by-zero on a constant column
        # instead of returning NULL — the guard restores the
        # NULL-on-zero-variance semantics DuckDB (and the docstring)
        # promise (found by test)
        aggs.append(
            F.when(
                (sa > 0) & (sb > 0), F.covar_samp(ca, cb) / (sa * sb)
            ).alias(f"_c{i}")
        )
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (a, b, row[f"_c{i}"], row["_n"]) for i, (a, b) in enumerate(pairs)
    ]
    return spark.createDataFrame(
        out, "col_a string, col_b string, corr double, n long"
    )
