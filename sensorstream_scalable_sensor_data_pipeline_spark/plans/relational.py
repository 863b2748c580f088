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
from sensorstream_scalable_sensor_data_pipeline_spark.schemas import (
    drop_all_null_columns,
    enforce_schema,
)
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
    "p4_p5_filters",
    oracle="""
    SELECT event_id, event_type, value FROM events
    WHERE value <> 0 AND event_type = 'click'
    """,
)
def p4_p5_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P5: inequality quality filter (dataintegrity != 0,
    main_pipeline.py:197) chained with the per-key equality slice
    (per-sensor filter, main_pipeline.py:313); `value` plays
    dataintegrity per FIXTURES.md. Both predicates fold into one
    pushed conjunction at the scan."""
    ev = load_table(spark, sf_dir, "events")
    return eq_filter(integrity_filter(ev, "value"), "event_type", "click").select(
        "event_id", "event_type", "value"
    )


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


#: p7_in_list's oracle, kept importable for the rotated-slot suite
#: (rotated out in round 15 — rotation #7; its slot now carries
#: dedup_audio_recovery; Catalyst `In` predicate mechanics stay
#: driver-visible via the p4_p5_filters row and the semi-join row
#: j3_semi_join, which expresses the same collect+IN idiom).
P7_IN_LIST_ORACLE = (
    "SELECT event_id, user_id FROM events "
    "WHERE user_id IN (1, 2, 3, 5, 8, 13, 21, 34)"
)


def p7_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: small driver-known IN-list (tagid IN (...),
    main_pipeline.py:296-298). Local-oracle since the r15 rotation
    (tests/test_queries_vs_oracle.py::test_rotated_p7_in_list_
    matches_oracle)."""
    ev = load_table(spark, sf_dir, "events")
    return in_list_filter(ev, "user_id", [1, 2, 3, 5, 8, 13, 21, 34]).select(
        "event_id", "user_id"
    )


@query(
    "p8_f7_regex_split",
    oracle="""
    SELECT p_partkey, p_type, split_part(p_name, ' ', 1) AS first_token,
           translate(p_name, ' ', '_') AS flat_name
    FROM part
    WHERE regexp_matches(p_type, '^PRO') OR regexp_matches(p_type, 'DARD$')
    """,
)
def p8_f7_regex_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8+F5/F7: OR-fold of regex predicates (tagpath ~ pattern,
    main_pipeline.py:343-350) feeding the split/flatten name mangling
    ("sensor/module/x" → "sensor_module_x", main_pipeline.py:309-311);
    p_type plays tagpath, p_name the hierarchical path."""
    part = load_table(spark, sf_dir, "part")
    return regex_filter(part, "p_type", ["^PRO", "DARD$"]).select(
        "p_partkey",
        "p_type",
        F.split(F.col("p_name"), " ").getItem(0).alias("first_token"),
        F.translate(F.col("p_name"), " ", "_").alias("flat_name"),
    )


#: p9_p10_project_rename's oracle, kept importable for the
#: rotated-slot suite (rotated out in round 13 — rotation #5; its
#: slot now carries sim_pq_adc_topk; projection mechanics stay
#: driver-carried by s1_scan_project + the schema unit tests).
P9_P10_PROJECT_RENAME_ORACLE = (
    "SELECT event_id, ts AS datetime, value AS sensor_value FROM events"
)


def p9_p10_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/P10: drop keys + rename value column to output names
    (main_pipeline.py:314-320). Local-oracle since the r13 rotation
    (tests/test_queries_vs_oracle.py::test_rotated_p9_p10_project_
    rename_matches_oracle)."""
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


def j_multi_hop_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 chained: two-hop dimension enrichment, both hops broadcast —
    a snowflaked TAGS analog.

    Rotated OUT of the 50-slot driver registry in round 8 (r7 verdict
    task #1): J1/J2 stay driver-covered by ``j1_broadcast_enrich``;
    the freed slot carries the temporal-join family
    (plans/temporal.py). Still oracle-pinned locally by
    tests/test_queries_vs_oracle.py's rotated-slot suite."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    step1 = enrich(cust, nation, cust["c_nationkey"] == nation["n_nationkey"], "inner")
    step2 = enrich(step1, region, nation["n_regionkey"] == region["r_regionkey"], "inner")
    return step2.select("c_custkey", "n_name", "r_name")


# --------------------------------------------------------- aggregations


@query(
    "a1_a3_a4_scalar_aggs",
    oracle="""
    SELECT max(ts) AS max_ts, count(*) AS n,
           least(greatest(max(ts), TIMESTAMP '2024-01-10 00:00:00'),
                 TIMESTAMP '2024-02-01 00:00:00') AS cutoff
    FROM events
    """,
)
def a1_a3_a4_scalar_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A3+A4 in one partial-aggregated pass: global MAX driving the
    incremental cutoff (main_pipeline.py:339), COUNT(*) output sizing
    (main_pipeline.py:226), and the min/max cutoff clamp
    (main_pipeline.py:340-341) as a distributed expression. The
    reference runs these as three separate driver jobs; one scan and a
    one-row exchange covers all three."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.max("ts").alias("max_ts"),
        F.count(F.lit(1)).alias("n"),
        F.least(
            F.greatest(F.max("ts"), F.lit("2024-01-10 00:00:00").cast("timestamp")),
            F.lit("2024-02-01 00:00:00").cast("timestamp"),
        ).alias("cutoff"),
    )


# ---------------------------------------------------------- set ops


#: u1_u2_union_suite's oracle, kept importable for the rotated-slot
#: local suite (tests/test_queries_vs_oracle.py) after the round-12
#: fourth rotation: its slot now carries ``w3_session_window``
#: (plans/analytics.py). Union/dedup semantics stay separately
#: driver-green via ``a2_d1_d2_distinct_dedup`` plus the setops unit
#: suite.
U1_U2_UNION_SUITE_ORACLE = """
    SELECT DISTINCT event_id, event_type FROM (
      SELECT event_id, event_type FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT event_id, event_type FROM events WHERE event_type = 'view'
      UNION ALL
      SELECT event_id, event_type FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT event_id, event_type FROM events WHERE user_id < 75
    )
    """


def u1_u2_union_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U2+D2: N-ary unionByName fold across per-month scans
    (main_pipeline.py:301-303, bug-fixed as a fold per SURVEY §2.7),
    then positional union with history and full dedup — the idempotent
    append path (main_pipeline.py:321-328). Catalyst flattens the
    union tree into one multi-child Union feeding a single hash
    aggregate. Rotated OUT of the 50-slot driver registry in round 12
    (stays locally oracle-pinned in the rotated-slot suite; the freed
    slot carries ``w3_session_window``)."""
    ev = load_table(spark, sf_dir, "events")
    parts = [
        eq_filter(ev, "event_type", t).select("event_id", "event_type")
        for t in ("click", "view", "purchase")
    ]
    fold = union_by_name_fold(parts)
    history = ev.filter(F.col("user_id") < 75).select("event_id", "event_type")
    return full_dedup(union_positional(fold, history))


# ------------------------------------------------------------- dedup


@query(
    "a2_d1_d2_distinct_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def a2_d1_d2_distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+D1+D2: key enumeration via DISTINCT (main_pipeline.py:309),
    keyed dropDuplicates — the reference's idempotency primitive
    (main_pipeline.py:328) — and whole-row distinct (prototype
    drop_duplicates, Initial pipeline with pandas.txt:186). Keys cover
    the projection, so key_dedup ∘ full_dedup is one well-defined
    result; Catalyst collapses the adjacent duplicate aggregates into
    one shuffle."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    return full_dedup(key_dedup(ev, ["user_id", "event_type"]))


def d1_dedup_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 deterministic variant: latest reading per sensor via
    struct-max aggregation (one shuffle, defined survivor) — what the
    engine uses wherever reproducibility matters.

    Rotated OUT of the 50-slot driver registry in round 8 (r7 verdict
    task #1): D1 stays driver-covered by ``a2_d1_d2_distinct_dedup``;
    the freed slot carries the temporal-join family
    (plans/temporal.py). Still oracle-pinned locally by
    tests/test_queries_vs_oracle.py's rotated-slot suite."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return key_dedup_deterministic(ev, ["user_id"], "ts", keep="max")


# ------------------------------------------------------------- sort


#: o1_global_sort's oracle, kept importable for the rotated-slot
#: suite (rotated out in round 14 — rotation #6; its slot now carries
#: dedup_phash_recovery; global-sort mechanics stay driver-visible in
#: every ORDER-BY-consuming registry row and plan-pinned locally).
O1_GLOBAL_SORT_ORACLE = "SELECT event_id, ts FROM events ORDER BY ts"


def o1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: global ascending sort before write (main_pipeline.py:328) —
    a range-partitioned sort, the only all-to-all in the reference's
    emit path. Local-oracle since the r14 rotation
    (tests/test_queries_vs_oracle.py::test_rotated_o1_global_sort_
    matches_oracle)."""
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
    "f1_f3_time_fns",
    oracle="""
    SELECT event_id, epoch_ms(ts) AS ts_ms, epoch_ms(epoch_ms(ts)) AS ts_restored,
           ts - INTERVAL 5 HOUR AS site_ts
    FROM events
    """,
)
def f1_f3_time_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F3: epoch-ms ↔ timestamp, integer-exact (vs the reference's
    lossy double division to_timestamp(t_stamp/1000),
    main_pipeline.py:198), plus UTC instant → site wall-clock,
    tz-naive (prototype's America/Bogota semantics, Initial pipeline
    with pandas.txt:179; Bogota is fixed UTC-5, which the oracle
    encodes literally)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        timestamp_to_epoch_ms("ts").alias("ts_ms"),
        epoch_ms_to_timestamp(timestamp_to_epoch_ms("ts")).alias("ts_restored"),
        to_site_time("ts").alias("site_ts"),
    )


@query(
    "f4_f6_string_date_fns",
    oracle="""
    SELECT event_id,
           regexp_replace(event_type, 'e', 'E', 'g') AS etype_upper_e,
           translate(event_type, 'aeiou', 'AEIOU') AS etype_vowels,
           event_type || '_' || CAST(user_id AS VARCHAR) AS tag_name,
           strftime(ts, '%Y-%m-%d') AS day_str
    FROM events
    """,
)
def f4_f6_string_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5+F6: regex replace + translate + concat — distributed
    forms of the reference's driver-side name mangling
    (main_pipeline.py:309-311) — plus date formatting (reference
    strptime/strftime driver logic, main_pipeline.py:337)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace("event_type", "e", "E").alias("etype_upper_e"),
        F.translate(F.col("event_type"), "aeiou", "AEIOU").alias("etype_vowels"),
        F.concat_ws("_", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "tag_name"
        ),
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
    )


@query(
    "p11_drop_null_cols",
    oracle="""
    SELECT event_id, value,
           CASE WHEN value > 1 THEN value END AS partial_null
    FROM events
    """,
)
def p11_drop_null_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: drop columns that are entirely null (prototype
    dropna(axis=1, how='all'), Initial pipeline with pandas.txt:181).
    A synthesized all-null column must be dropped while a
    partially-null one survives — the distinction schema pruning
    cannot make. One count-per-column aggregate then a select; the
    extra pass is inherent (the output schema is data-dependent)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.when(F.col("value") > 1, F.col("value")).alias("partial_null"),
        F.lit(None).cast("double").alias("all_null"),
    )
    return drop_all_null_columns(ev)


# ------------------------------------------------- incremental extract


#: x12_incremental_extract's oracle, kept importable for the
#: rotated-slot suite (rotated out in round 16 — rotation #8; its
#: slot now carries dedup_video_recovery; the cutoff-clamp + range
#: semantics stay driver-visible via the p6_range_cutoff and
#: a1_a3_a4_scalar_aggs rows, and the incremental FAMILY's
#: correctness rests on the far stronger ingest/recovery pins).
X12_INCREMENTAL_EXTRACT_ORACLE = """
    SELECT event_id, ts, user_id, value FROM events
    WHERE ts >= (SELECT max(ts) - INTERVAL 7 DAY FROM events)
    """


def x12_incremental_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12: incremental re-extract — rows at/after a cutoff derived
    from the materialized maximum (main_pipeline.py:331-341), kept
    fully distributed via a broadcast scalar join instead of a
    driver collect. Local-oracle since the r16 rotation
    (tests/test_queries_vs_oracle.py::test_rotated_x12_incremental_
    extract_matches_oracle)."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("_cutoff"))
    return (
        ev.crossJoin(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("_cutoff"))
        .select("event_id", "ts", "user_id", "value")
    )
