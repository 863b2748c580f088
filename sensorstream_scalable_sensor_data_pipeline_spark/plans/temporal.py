"""Bench heads for the temporal-join family (operators/asof.py).

The sensor-domain daily drivers — as-of enrichment, containment
joins, regular-grid gap-fill, derivatives — generalize the
reference's broadcast enrichment join to time (main_pipeline.py:196).
They are locally oracle-checked against DuckDB's native ASOF /
BETWEEN joins (tests/test_asof.py) but sit outside the driver's
50-row registry cap, so these wrappers give them standing PERF
evidence in bench.py (r3/r4 verdict "What's missing #1").

Workload shapes (at sf0.1: ~100 k events, ~32 keys):

* ``asof_join_head`` — every event enriched with the latest
  "calibration state" (every 97th event plays a state change): the
  canonical reading × slowly-changing-state join. One keyed window
  shuffle.
* ``range_join_head`` — events × 6-hour maintenance windows (every
  151st event opens one): bucketed containment, interval fan-out ~7
  rows each, plain equi-join on (key, hour-bucket).
* ``resample_locf_head`` — every key's span regridded at 15-minute
  steps with carried observations: grid explode (two-level, bounded
  arrays) + the as-of compose.
* ``rate_of_change_head`` — per-key first derivative: one keyed
  window, pure column math.

MEASUREMENT HONESTY — every head ends in a small per-key summary that
CONSUMES the operator's computed columns. bench.py materializes heads
with ``count()``, and Catalyst prunes columns nobody reads: for a
per-row operator whose expensive work lives entirely in an unread
column, pruning deletes the operator from the counted plan — measured
on ``asof_join`` at 20 M rows: 0.29 s for the bare count (Window
node GONE from the optimized plan) vs 8.56 s with the carried value
consumed. The summary aggregate (count + avg over the value columns)
forces full evaluation while adding one tiny keyed agg — the
realistic consumption shape anyway (dashboards aggregate enriched
readings; nobody materializes 100 TB of joined rows to look at them).
``range_join_head`` is the exception: its join condition and
cardinality already consume the interval bounds, so it returns raw
pairs (the pair count IS the result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.asof import (
    asof_join,
    range_join,
    rate_of_change,
    resample_locf,
)
from sensorstream_scalable_sensor_data_pipeline_spark.plans.registry import query
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
    load_table,
    widen_scan,
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )


def _calib_state(ev: DataFrame) -> DataFrame:
    """Deterministic slowly-changing state: every 97th event is a
    calibration change carrying its value (same shape as
    tests/test_asof.py so bench and oracle exercise one workload)."""
    return ev.filter(F.col("event_id") % 97 == 0).select(
        "user_id", "ts", F.col("value").alias("calib_value")
    )


def asof_join_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    enriched = asof_join(
        ev, _calib_state(ev), on="user_id", time_col="ts",
        value_cols=["calib_value"],
    )
    return enriched.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_readings"),
        F.count("calib_value").alias("n_calibrated"),
        F.avg("calib_value").alias("avg_calib"),
    )


def range_join_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    wins = ev.filter(F.col("event_id") % 151 == 0).select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("end_ts"),
    )
    return range_join(
        ev.select("event_id", "user_id", "ts"), wins,
        on="user_id", time_col="ts",
        start_col="start_ts", end_col="end_ts", bucket_seconds=3600,
    )


def resample_locf_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    grid = resample_locf(
        ev.select("user_id", "ts", "value"), on="user_id", time_col="ts",
        value_cols=["value"], step_seconds=900,
    )
    return grid.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_grid_points"),
        F.count("value").alias("n_filled"),
        F.avg("value").alias("avg_value"),
    )


#: Deterministic amplification for the skew heads: sf0.1's 100 k
#: events × 256 = 25.6 M rows, half of them on ONE key.
SKEW_AMPLIFY = 256


def _skewed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key workload built from the events table, deterministically:
    every event replicated SKEW_AMPLIFY× (with a microsecond shift per
    replica so timestamps stay distinct), and all even user_ids folded
    onto key 0 — one key carries ~50 % of all rows. Scan-side explode,
    no shuffle."""
    # r16 (guide §2.5): the events scan is ONE task, so the ×256
    # explode below (25.6 M rows at sf0.1) was generated on one core
    # — repartition the 100k base rows first (tiny shuffle) so the
    # amplification runs machine-wide. No-op on multi-split scans.
    ev = widen_scan(_events(spark, sf_dir))
    amplified = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(SKEW_AMPLIFY - 1))).alias("_rep"),
    )
    return amplified.select(
        (F.col("event_id") * SKEW_AMPLIFY + F.col("_rep")).alias("event_id"),
        F.when(F.col("user_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        F.timestamp_micros(F.unix_micros(F.col("ts")) + F.col("_rep")).alias("ts"),
        "value",
    )


def _skewed_summary(enriched: DataFrame) -> DataFrame:
    return enriched.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_readings"),
        F.count("calib_value").alias("n_calibrated"),
        F.avg("calib_value").alias("avg_calib"),
    )


def asof_join_skewed_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PLAIN as-of on the hot-key workload: one task sorts the hot
    key's ~12.8 M-row history serially.

    MEASUREMENT HONESTY: at bench scale this pair reads as a WASH —
    Spark's window sort radix-sorts the 8-byte (ts, is_r) prefix at
    ~50 M rows/s, so a 12.8 M-row serial sort costs well under a
    second and the scan+explode dominates both heads. The funnel the
    bucketed variant exists for appears when the hot key's sort run
    EXCEEDS one task's memory and spills (the controlled experiment
    in operators/asof.py's docstring: 8 M rows under local[8]'s
    per-task budget measured 2.5-4.7× serial penalty) — i.e. at the
    100 TB deployment's per-executor budget, not at any size a local
    bench can hold in RAM. The pair still earns its place: identical
    results under deliberate 50 %-on-one-key skew (equivalence
    pinned), and the bucketed head's flat cost curve IS the evidence
    that the escape hatch adds only fixed overhead."""
    ev = _skewed_events(spark, sf_dir)
    st = ev.filter(F.col("event_id") % 97 == 0).select(
        "user_id", "ts", F.col("value").alias("calib_value")
    )
    return _skewed_summary(
        asof_join(ev, st, on="user_id", time_col="ts", value_cols=["calib_value"])
    )


def asof_join_skewed_bucketed_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The escape hatch on the same workload, AUTO-sized (r10): the
    pre-flight density aggregate picks bucket_seconds from the hot
    key's measured rows/s (~12.8 M rows over the 30-day span →
    ~1-day buckets at the 500 k target — the same size the head
    hand-pinned through r9, now derived instead of guessed; the
    pre-flight itself is timed as part of the head, honestly).
    Identical output to the plain head (equivalence pinned in
    tests/test_asof.py); the head-to-head delta in BENCH_r{N} is the
    hot-key win's standing perf evidence. CEILING (r10 decomposition,
    COVERAGE_HISTORY round-10 notes): the join itself wins 2.3× warm
    (21.9 → 9.3 s); the cold-JVM pair reads ~1.55× because ~6 s of
    shared cold floor (JVM/codegen + the amplification explode both
    heads pay identically) dilutes the end-to-end ratio."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.asof import (
        asof_join_bucketed,
    )

    ev = _skewed_events(spark, sf_dir)
    st = ev.filter(F.col("event_id") % 97 == 0).select(
        "user_id", "ts", F.col("value").alias("calib_value")
    )
    return _skewed_summary(
        asof_join_bucketed(
            ev, st, on="user_id", time_col="ts",
            value_cols=["calib_value"], bucket_seconds="auto",
        )
    )


def rate_of_change_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    rated = rate_of_change(ev, on="user_id", time_col="ts", value_col="value")
    return rated.groupBy("user_id").agg(
        F.count("rate_per_s").alias("n_rates"),
        F.avg(F.abs(F.col("rate_per_s"))).alias("mean_abs_rate"),
        F.max(F.abs(F.col("rate_per_s"))).alias("max_abs_rate"),
    )


# --- driver-registry entries (round-8 rotation, r7 verdict task #1) ---
#
# The temporal-join family is the most user-load-bearing extension
# without a CORRECTNESS row; these three slots were freed by
# deregistering redundant entries (`d1_dedup_deterministic`,
# `j_multi_hop_enrich`, `q6_forecast_revenue` — each still covered by
# another driver row for its §2 semantics and oracle-pinned locally).
# The registered shapes mirror tests/test_asof.py's DuckDB-native
# ASOF/BETWEEN oracles exactly, so driver and local suite exercise one
# workload. Bench heads above keep their summary-aggregate consumption
# shape (measurement honesty); driver rows return the raw joined
# columns the value-hash compares.


@query(
    "funnel_match",
    oracle="""
    WITH p AS (SELECT user_id, ts FROM events WHERE event_type='purchase'),
         c AS (SELECT user_id, ts FROM events WHERE event_type='click'),
         v AS (SELECT user_id, ts FROM events WHERE event_type='view')
    SELECT CAST(p.user_id AS BIGINT) AS user_id,
           epoch_us(v.ts) AS ts_us_0,
           epoch_us(c.ts) AS ts_us_1,
           epoch_us(p.ts) AS ts_us_2
    FROM p
    ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ASOF JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def funnel_match_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel / event-sequence matching (operators/funnel.py),
    driver-checked: the view → click → purchase last-touch chains
    over the events table — each purchase anchored to its latest
    preceding click, that click to its latest preceding view,
    inclusively. The oracle is DuckDB's NATIVE chained ``ASOF JOIN``,
    so the value hash pins the full backward-matching semantics
    (latest-wins, inclusive ties, incomplete chains absent).

    Rotated INTO the 50-slot registry in round 10 (second rotation),
    taking ``text_fingerprint``'s slot (that query stays locally
    oracle-pinned in the rotated-slot suite)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.funnel import (
        funnel_match,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    m = funnel_match(
        ev, on="user_id", time_col="ts", type_col="event_type",
        steps=["view", "click", "purchase"],
    )
    return m.select(
        "user_id",
        *[
            F.unix_micros(F.col(f"ts_{i}")).alias(f"ts_us_{i}")
            for i in range(3)
        ],
    )


@query(
    "asof_join",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, ts, value FROM events),
    calib AS (
      SELECT user_id, ts, max(value) AS calib_value
      FROM events WHERE event_id % 97 = 0 GROUP BY user_id, ts
    )
    SELECT l.event_id, r.calib_value
    FROM ev l ASOF LEFT JOIN calib r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (latest-state) join: every reading enriched with the most
    recent calibration state at-or-before its timestamp — the temporal
    generalization of the reference's broadcast enrichment join
    (main_pipeline.py:196). One keyed window shuffle, no inequality
    join; oracle is DuckDB's NATIVE ``ASOF LEFT JOIN``."""
    ev = _events(spark, sf_dir)
    return asof_join(
        ev, _calib_state(ev), on="user_id", time_col="ts",
        value_cols=["calib_value"],
    ).select("event_id", "calib_value")


@query(
    "range_join",
    oracle="""
    WITH wins AS (
      SELECT event_id AS win_id, user_id, ts AS start_ts,
             ts + INTERVAL 6 HOUR AS end_ts
      FROM events WHERE event_id % 151 = 0
    )
    SELECT l.event_id, w.win_id
    FROM events l JOIN wins w
      ON l.user_id = w.user_id
     AND l.ts >= w.start_ts AND l.ts <= w.end_ts
    """,
)
def range_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join via time bucketing: readings ×
    6-hour maintenance windows as a plain equi-join on
    (key, hour-bucket) — never a nested loop (plan-pinned in
    tests/test_asof.py); oracle is the naive BETWEEN join."""
    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    wins = ev.filter(F.col("event_id") % 151 == 0).select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("end_ts"),
    )
    return range_join(
        ev, wins, on="user_id", time_col="ts",
        start_col="start_ts", end_col="end_ts", bucket_seconds=3600,
    ).select("event_id", "win_id")


@query(
    "resample_locf",
    oracle="""
    WITH r AS (
      SELECT user_id, ts, max(value) AS value FROM events
      WHERE user_id % 25 = 0 GROUP BY user_id, ts
    ),
    b AS (SELECT user_id, min(ts) AS mn, max(ts) AS mx FROM r GROUP BY user_id),
    grid AS (
      SELECT user_id,
             unnest(generate_series(
               CAST(to_timestamp(CAST(floor(epoch(mn) / 21600) AS BIGINT) * 21600) AS TIMESTAMP),
               mx, INTERVAL 6 HOUR)) AS ts
      FROM b
    )
    SELECT g.user_id, g.ts, r.value
    FROM grid g ASOF LEFT JOIN r ON g.user_id = r.user_id AND g.ts >= r.ts
    """,
)
def resample_locf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid LOCF resampling (TimescaleDB
    ``time_bucket_gapfill`` + ``locf``): a few keys' spans regridded
    at 6-hour steps with carried observations. Bounded two-level grid
    explode + the as-of compose; oracle is DuckDB generate_series +
    native ASOF LEFT JOIN."""
    ev = (
        _events(spark, sf_dir)
        .filter(F.col("user_id") % 25 == 0)
        .select("user_id", "ts", "value")
    )
    return resample_locf(ev, "user_id", "ts", ["value"], step_seconds=6 * 3600)


def rolling_zscore_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench head for operators/anomaly.py::rolling_zscore: every
    event scored against its key's trailing 7 days (one keyed RANGE
    window over exact grid sums), summarized per key so the z column
    is consumed (measurement-honesty doctrine above)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.anomaly import (
        rolling_zscore,
    )

    ev = _events(spark, sf_dir)
    scored = rolling_zscore(
        ev, on="user_id", time_col="ts", value_col="value",
        window_seconds=7 * 24 * 3600, z_threshold=2.0,
    )
    return scored.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_readings"),
        F.sum(F.col("is_anomaly").cast("long")).alias("n_anomalies"),
        F.avg(F.abs(F.col("zscore"))).alias("avg_abs_z"),
    )


def ewma_smooth_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench head (r10) for operators/recurrence.py::ewma_irregular —
    the time-decay linear-recurrence smoother over every event, 6 h
    halflife, summarized per key so the smoothed column is consumed
    (bench-head doctrine). Cost shape: one keyed row_number window,
    one (key, chunk) fold pass, one per-key carry pass, one stitch
    join — the recurrence is the only operator here whose per-row
    math cannot fuse into a single window, so the head records what
    the decomposition overhead actually costs at corpus scale."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.recurrence import (
        ewma_irregular,
    )

    ev = _events(spark, sf_dir)
    sm = ewma_irregular(
        ev.select("user_id", "ts", "value"),
        on="user_id", time_col="ts", value_col="value",
        halflife_seconds=6 * 3600.0,
    )
    return sm.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("ewma").alias("avg_smooth"),
        F.max(F.abs(F.col("value") - F.col("ewma"))).alias("max_dev"),
    )


def ewma_constant_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-rung head (r11, EXTRA_HEADS-only — not in the HEADLINE
    list): the CONSTANT-α EWMA form (operators/recurrence.py::ewma,
    pandas ``ewm(adjust=False)`` semantics) over every event, so the
    sf1 stress table carries measured rungs for BOTH recurrence
    forms (``ewma_smooth`` covers the time-decay irregular form).
    Same consumption shape as ewma_smooth_head."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.recurrence import (
        ewma,
    )

    ev = _events(spark, sf_dir)
    sm = ewma(
        ev.select("user_id", "ts", "value"),
        on="user_id", time_col="ts", value_col="value", alpha=0.1,
    )
    return sm.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("ewma").alias("avg_smooth"),
        F.max(F.abs(F.col("value") - F.col("ewma"))).alias("max_dev"),
    )
