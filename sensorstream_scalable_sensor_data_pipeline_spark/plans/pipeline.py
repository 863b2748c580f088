"""The flagship pipeline query — the reference's end-to-end flow as ONE plan.

The reference's run() (main_pipeline.py:262-271) composes: load fact →
broadcast-enrich with tags → integrity filter → epoch→timestamp →
dedup on event time → ordered per-sensor output
(SURVEY §3.1). Here that whole flow is a single declarative DataFrame
program over the FIXTURES.md mapping (events≈SENSOR_RAW,
customer≈TAGS, c_mktsegment≈tagpath category):

events ⟕ broadcast(customer) → value≠0 → deterministic dedup on
(user_id, ts) → (tagpath, datetime, sensor_value) series.

Plan shape (verified via .explain): one parquet scan of the fact with
pushed filter + pruned columns, one BroadcastHashJoin (fact never
shuffles), one hash aggregate for the dedup — a single shuffle total.
At 100 TB: broadcast dim ≤ MBs, dedup shuffle is keyed on
(user_id, ts) which is near-unique → uniform, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup import (
    key_dedup_deterministic,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.enrich import enrich
from sensorstream_scalable_sensor_data_pipeline_spark.operators.filters import integrity_filter
from sensorstream_scalable_sensor_data_pipeline_spark.plans.registry import query
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table


def sensor_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clean per-sensor time series — the reference's core question."""
    ev = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("tagpath")
    )
    clean = integrity_filter(ev, "value")
    enriched = enrich(clean, dim, on="user_id", how="left").select(
        "user_id", "ts", "value", "tagpath"
    )
    deduped = key_dedup_deterministic(enriched, ["user_id", "ts"], "value", keep="max")
    return deduped.select(
        F.col("tagpath"),
        F.col("ts").alias("datetime"),
        F.col("value").alias("sensor_value"),
        F.col("user_id").alias("sensor_id"),
    )


SENSOR_SERIES_ORACLE = """
SELECT tagpath, datetime, sensor_value, sensor_id FROM (
  SELECT c.c_mktsegment AS tagpath, e.ts AS datetime, e.value AS sensor_value,
         e.user_id AS sensor_id,
         row_number() OVER (
           PARTITION BY e.user_id, e.ts
           ORDER BY e.value DESC, c.c_mktsegment DESC
         ) AS rn
  FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
  WHERE e.value <> 0
) WHERE rn = 1
"""

query("sensor_pipeline_e2e", oracle=SENSOR_SERIES_ORACLE)(sensor_series)


from sensorstream_scalable_sensor_data_pipeline_spark.plans.registry import dsum_sql


# Sliding windows: size 1 h, slide 30 min → every event falls in
# exactly 2 windows. The oracle replays Spark's window assignment with
# integer epoch math (identical in both engines): for offset k ∈ {0,1},
# start = floor((epoch_s(ts) - k·1800) / 3600)·3600 + k·1800.
_SLIDING_ORACLE = f"""
SELECT to_timestamp(CAST(floor((epoch(ts) - k * 1800) / 3600) * 3600 + k * 1800 AS BIGINT))
         AT TIME ZONE 'UTC' AS window_start,
       count(*) AS n_readings,
       {dsum_sql('value')} AS sum_value
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
WHERE value <> 0
GROUP BY 1
"""


@query("sensor_sliding_rollup", oracle=_SLIDING_ORACLE)
def sensor_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rollup (1 h windows every 30 min) — the
    overlapping-window form of the hourly rollup, and the same
    operator a watermarked stream would run. Spark's window()
    replicates each row into its 2 windows before one partial-
    aggregated shuffle on window_start — fan-out is bounded by
    size/slide, keys stay time-uniform at any scale."""
    from sensorstream_scalable_sensor_data_pipeline_spark.functions.aggfns import dsum

    ev = load_table(spark, sf_dir, "events")
    clean = integrity_filter(ev, "value")
    return (
        clean.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_readings", "sum_value")
    )


@query(
    "sensor_hourly_rollup",
    oracle=f"""
    SELECT c.c_mktsegment AS tagpath, date_trunc('hour', e.ts) AS hour,
           {dsum_sql('e.value')} AS sum_value,
           count(*) AS n_readings,
           max(e.ts) AS last_seen
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.value <> 0
    GROUP BY 1, 2
    """,
)
def sensor_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: the continuous-aggregate the reference's
    consumers build downstream (per-category hourly totals). One scan,
    one partial-aggregated shuffle on (tagpath, hour) — time-bucketed
    keys stay uniform at any scale."""
    from sensorstream_scalable_sensor_data_pipeline_spark.functions.aggfns import dsum

    ev = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("tagpath")
    )
    clean = integrity_filter(ev, "value")
    enriched = enrich(clean, dim, on="user_id", how="left")
    return enriched.groupBy(
        F.col("tagpath"), F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        dsum(F.col("value")).alias("sum_value"),
        F.count(F.lit(1)).alias("n_readings"),
        F.max("ts").alias("last_seen"),
    )
