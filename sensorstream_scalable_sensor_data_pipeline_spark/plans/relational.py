"""Reference-surface relational queries (SURVEY.md §2 rows → oracle-checked).

One registered query per operator-inventory row, each exercising the
corresponding engine operator on the driver's synthetic tables under
the FIXTURES.md role mapping (events≈SENSOR_RAW, customer≈TAGS).
Column names are aliased identically in the Spark plan and the DuckDB
oracle — the driver's comparison sorts columns by name before hashing.

Determinism rules used throughout (see functions/aggfns.py):
double aggregations go through exact decimal accumulation; surviving
rows under dedup are picked deterministically; top-k orders always
carry a unique tiebreak column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sensorstream_scalable_sensor_data_pipeline_spark.functions.aggfns import dsum
from sensorstream_scalable_sensor_data_pipeline_spark.functions.timefns import (
    epoch_ms_to_timestamp,
    timestamp_to_epoch_ms,
    to_site_time,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup import (
    full_dedup,
    key_dedup,
    key_dedup_deterministic,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.enrich import enrich, semi_filter
from sensorstream_scalable_sensor_data_pipeline_spark.operators.filters import (
    eq_filter,
    in_list_filter,
    integrity_filter,
    range_filter,
    regex_filter,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.pivot import pivot_wide
from sensorstream_scalable_sensor_data_pipeline_spark.operators.setops import (
    union_by_name_fold,
    union_positional,
)
from sensorstream_scalable_sensor_data_pipeline_spark.plans.registry import dsum_sql, query
from sensorstream_scalable_sensor_data_pipeline_spark.schemas import enforce_schema
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

# ---------------------------------------------------------------- scans


@query(
    "s1_scan_project",
    oracle="SELECT event_id, user_id, value FROM events",
)
def s1_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P1: parquet scan + column projection; Catalyst prunes the
    read schema to the three selected columns (main_pipeline.py:108-120,
    211)."""
    return load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")


@query(
    "p2_schema_enforce",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id, ts,
           CAST(user_id AS INT) AS user_id, CAST(value AS DOUBLE) AS value
    FROM events
    """,
)
def p2_schema_enforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3: cast/require/prune to a declared schema
    (_validate_schema, main_pipeline.py:202-211)."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("user_id", T.IntegerType(), False),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    return enforce_schema(load_table(spark, sf_dir, "events"), schema)


# -------------------------------------------------------------- filters


@query(
    "p4_integrity_filter",
    oracle="SELECT event_id, value FROM events WHERE value <> 0",
)
def p4_integrity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: inequality quality filter (dataintegrity != 0,
    main_pipeline.py:197); `value` plays dataintegrity per FIXTURES.md."""
    ev = load_table(spark, sf_dir, "events")
    return integrity_filter(ev, "value").select("event_id", "value")


@query(
    "p5_eq_slice",
    oracle="SELECT event_id, event_type, value FROM events WHERE event_type = 'click'",
)
def p5_eq_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: per-key equality slice (per-sensor filter,
    main_pipeline.py:313)."""
    ev = load_table(spark, sf_dir, "events")
    return eq_filter(ev, "event_type", "click").select("event_id", "event_type", "value")


@query(
    "p6_range_cutoff",
    oracle="""
    SELECT event_id, ts FROM events
    WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' AND ts < TIMESTAMP '2024-01-22 00:00:00'
    """,
)
def p6_range_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/X8: cutoff range predicate, pushed to the parquet scan
    (t_stamp >= cutoff, main_pipeline.py:296-300). Uses the raw-column
    range loader so the bounds reach parquet row-group pruning —
    filtering the *converted* timestamp would leave only IsNotNull
    pushable (sources/tables.py::load_events_range)."""
    import datetime as dt

    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
        load_events_range,
    )

    ev = load_events_range(
        spark, sf_dir, low=dt.datetime(2024, 1, 15), high=dt.datetime(2024, 1, 22)
    )
    return ev.select("event_id", "ts")


@query(
    "p7_in_list",
    oracle="SELECT event_id, user_id FROM events WHERE user_id IN (1, 2, 3, 5, 8, 13, 21, 34)",
)
def p7_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: small driver-known IN-list (tagid IN (...),
    main_pipeline.py:296-298)."""
    ev = load_table(spark, sf_dir, "events")
    return in_list_filter(ev, "user_id", [1, 2, 3, 5, 8, 13, 21, 34]).select(
        "event_id", "user_id"
    )


@query(
    "p8_regex_patterns",
    oracle="""
    SELECT p_partkey, p_type FROM part
    WHERE regexp_matches(p_type, '^PRO') OR regexp_matches(p_type, 'DARD$')
    """,
)
def p8_regex_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: OR-fold of regex predicates (tagpath ~ pattern,
    main_pipeline.py:343-350); p_type plays tagpath."""
    part = load_table(spark, sf_dir, "part")
    return regex_filter(part, "p_type", ["^PRO", "DARD$"]).select("p_partkey", "p_type")


@query(
    "p9_p10_project_rename",
    oracle="SELECT event_id, ts AS datetime, value AS sensor_value FROM events",
)
def p9_p10_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/P10: drop keys + rename value column to output names
    (main_pipeline.py:314-320)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.drop("props", "event_type", "user_id")
        .withColumnRenamed("ts", "datetime")
        .withColumnRenamed("value", "sensor_value")
    )


# ---------------------------------------------------------------- joins


@query(
    "j1_broadcast_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def j1_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: broadcast left-outer fact×dim enrichment — the reference's
    only Spark join (main_pipeline.py:196). The fact side never
    shuffles; the dim ships once per executor."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    joined = enrich(ev, cust, ev["user_id"] == cust["c_custkey"], "left")
    return joined.select("event_id", "user_id", "c_name", "c_mktsegment")


@query(
    "j3_semi_join",
    oracle="""
    SELECT event_id, user_id FROM events
    WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left-semi join — the distributed form of the reference's
    collect-matching-ids-into-IN-list (main_pipeline.py:343-350). No
    ids touch the driver."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    keys = eq_filter(cust, "c_mktsegment", "BUILDING").select(
        F.col("c_custkey").alias("user_id")
    )
    return semi_filter(ev, keys, "user_id").select("event_id", "user_id")


@query(
    "j_multi_hop_enrich",
    oracle="""
    SELECT c.c_custkey, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def j_multi_hop_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 chained: two-hop dimension enrichment, both hops broadcast —
    a snowflaked TAGS analog."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    step1 = enrich(cust, nation, cust["c_nationkey"] == nation["n_nationkey"], "inner")
    step2 = enrich(step1, region, nation["n_regionkey"] == region["r_regionkey"], "inner")
    return step2.select("c_custkey", "n_name", "r_name")


# --------------------------------------------------------- aggregations


@query("a1_max_watermark", oracle="SELECT max(ts) AS max_ts FROM events")
def a1_max_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: global MAX driving the incremental cutoff
    (main_pipeline.py:339)."""
    return load_table(spark, sf_dir, "events").agg(F.max("ts").alias("max_ts"))


@query("a2_distinct_keys", oracle="SELECT DISTINCT event_type FROM events")
def a2_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: single-column DISTINCT enumerating emit keys
    (main_pipeline.py:309)."""
    return load_table(spark, sf_dir, "events").select("event_type").distinct()


@query("a3_count", oracle="SELECT count(*) AS n FROM events")
def a3_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: COUNT(*) (output-sizing count, main_pipeline.py:226)."""
    return load_table(spark, sf_dir, "events").agg(F.count(F.lit(1)).alias("n"))


@query(
    "a4_cutoff_clamp",
    oracle="""
    SELECT least(greatest(max(ts), TIMESTAMP '2024-01-10 00:00:00'),
                 TIMESTAMP '2024-02-01 00:00:00') AS cutoff
    FROM events
    """,
)
def a4_cutoff_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: min/max clamp of the cutoff watermark
    (main_pipeline.py:340-341) as a distributed expression."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.least(
            F.greatest(F.max("ts"), F.lit("2024-01-10 00:00:00").cast("timestamp")),
            F.lit("2024-02-01 00:00:00").cast("timestamp"),
        ).alias("cutoff")
    )


# ---------------------------------------------------------- set ops


@query(
    "u1_union_fold",
    oracle="""
    SELECT event_id, event_type FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type FROM events WHERE event_type = 'view'
    UNION ALL
    SELECT event_id, event_type FROM events WHERE event_type = 'purchase'
    """,
)
def u1_union_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: N-ary unionByName fold across per-month scans
    (main_pipeline.py:301-303, bug-fixed as a fold per SURVEY §2.7)."""
    ev = load_table(spark, sf_dir, "events")
    parts = [
        eq_filter(ev, "event_type", t).select("event_id", "event_type")
        for t in ("click", "view", "purchase")
    ]
    return union_by_name_fold(parts)


@query(
    "u2_union_dedup",
    oracle="""
    SELECT DISTINCT event_id FROM (
      SELECT event_id FROM events WHERE user_id < 75
      UNION ALL
      SELECT event_id FROM events
    )
    """,
)
def u2_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2+D2: positional union with history then dedup — the
    idempotent append path (main_pipeline.py:321-328)."""
    ev = load_table(spark, sf_dir, "events")
    subset = ev.filter(F.col("user_id") < 75).select("event_id")
    return full_dedup(union_positional(subset, ev.select("event_id")))


# ------------------------------------------------------------- dedup


@query("d1_key_dedup", oracle="SELECT DISTINCT user_id, ts FROM events")
def d1_key_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: keyed dedup — the reference's idempotency primitive
    (dropDuplicates(["datetime"]), main_pipeline.py:328). Projected to
    the key so the surviving row is well-defined for the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return key_dedup(ev.select("user_id", "ts"), ["user_id", "ts"])


@query(
    "d1_dedup_deterministic",
    oracle="""
    SELECT user_id, ts, event_id FROM (
      SELECT user_id, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def d1_dedup_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 deterministic variant: latest reading per sensor via
    struct-max aggregation (one shuffle, defined survivor) — what the
    engine uses wherever reproducibility matters."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return key_dedup_deterministic(ev, ["user_id"], "ts", keep="max")


@query("d2_full_dedup", oracle="SELECT DISTINCT user_id, event_type FROM events")
def d2_full_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: whole-row distinct (prototype drop_duplicates, Initial
    pipeline with pandas.txt:186)."""
    return full_dedup(load_table(spark, sf_dir, "events").select("user_id", "event_type"))


# ------------------------------------------------------------- sort


@query("o1_global_sort", oracle="SELECT event_id, ts FROM events ORDER BY ts")
def o1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: global ascending sort before write (main_pipeline.py:328) —
    a range-partitioned sort, the only all-to-all in the reference's
    emit path."""
    return load_table(spark, sf_dir, "events").select("event_id", "ts").orderBy("ts")


# ------------------------------------------------------------- pivot


PIVOT_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "w1_pivot_wide",
    oracle=f"""
    SELECT date_trunc('day', ts) AS day,
           {", ".join(dsum_sql(f"CASE WHEN event_type = '{t}' THEN value END") + f' AS "{t}"' for t in PIVOT_EVENT_TYPES)}
    FROM events GROUP BY 1
    """,
)
def w1_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: tall→wide pivot replacing the reference's per-sensor write
    loop (main_pipeline.py:305-329) with ONE hash aggregate. The
    explicit value list skips the extra distinct-scan job and bounds
    the plan's width — mandatory at scale (SURVEY §7 risks)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    return pivot_wide(ev, "day", "event_type", dsum(F.col("value")), PIVOT_EVENT_TYPES)


# ------------------------------------------------------ scalar functions


@query(
    "f1_epoch_ms_roundtrip",
    oracle="""
    SELECT event_id, epoch_ms(ts) AS ts_ms, epoch_ms(epoch_ms(ts)) AS ts_restored
    FROM events
    """,
)
def f1_epoch_ms_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F6: epoch-ms ↔ timestamp, integer-exact (vs the reference's
    lossy double division to_timestamp(t_stamp/1000),
    main_pipeline.py:198)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        timestamp_to_epoch_ms("ts").alias("ts_ms"),
        epoch_ms_to_timestamp(timestamp_to_epoch_ms("ts")).alias("ts_restored"),
    )


@query(
    "f3_site_timezone",
    oracle="SELECT event_id, ts - INTERVAL 5 HOUR AS site_ts FROM events",
)
def f3_site_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: UTC instant → site wall-clock, tz-naive (prototype's
    America/Bogota semantics, Initial pipeline with pandas.txt:179;
    Bogota is fixed UTC-5, which the oracle encodes literally)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", to_site_time("ts").alias("site_ts"))


@query(
    "f4_f5_string_ops",
    oracle="""
    SELECT event_id,
           regexp_replace(event_type, 'e', 'E', 'g') AS etype_upper_e,
           translate(event_type, 'aeiou', 'AEIOU') AS etype_vowels,
           event_type || '_' || CAST(user_id AS VARCHAR) AS tag_name
    FROM events
    """,
)
def f4_f5_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5: regex replace + translate + concat — distributed forms
    of the reference's driver-side name mangling
    (main_pipeline.py:309-311)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace("event_type", "e", "E").alias("etype_upper_e"),
        F.translate(F.col("event_type"), "aeiou", "AEIOU").alias("etype_vowels"),
        F.concat_ws("_", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "tag_name"
        ),
    )


@query(
    "f6_date_format",
    oracle="SELECT event_id, strftime(ts, '%Y-%m-%d') AS day_str FROM events",
)
def f6_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: date formatting (reference strptime/strftime driver logic,
    main_pipeline.py:337)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", F.date_format("ts", "yyyy-MM-dd").alias("day_str"))


@query(
    "f7_split_tokens",
    oracle="""
    SELECT p_partkey, split_part(p_name, ' ', 1) AS first_token,
           translate(p_name, ' ', '_') AS flat_name
    FROM part
    """,
)
def f7_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F7: split + flatten — tagpath "sensor/module/x" → "sensor_module_x"
    name flattening (main_pipeline.py:309-311) over p_name."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.split(F.col("p_name"), " ").getItem(0).alias("first_token"),
        F.translate(F.col("p_name"), " ", "_").alias("flat_name"),
    )


# ------------------------------------------------- incremental extract


@query(
    "x12_incremental_extract",
    oracle="""
    SELECT event_id, ts, user_id, value FROM events
    WHERE ts >= (SELECT max(ts) - INTERVAL 7 DAY FROM events)
    """,
)
def x12_incremental_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12: incremental re-extract — rows at/after a cutoff derived
    from the materialized maximum (main_pipeline.py:331-341), kept
    fully distributed via a broadcast scalar join instead of a
    driver collect."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("_cutoff"))
    return (
        ev.crossJoin(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("_cutoff"))
        .select("event_id", "ts", "user_id", "value")
    )
