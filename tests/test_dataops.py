"""Data-ops tooling (operators/dataops.py): snapshot diff vs a DuckDB
oracle, one-pass expectation gates, uniqueness/referential checks."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.dataops import (
    expect_in_range,
    expect_in_set,
    expect_matches,
    expect_not_null,
    expect_or_raise,
    expect_references,
    expect_unique,
    table_diff,
    validate_expectations,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SUP = os.path.join(SF_DIR, "supplier.parquet")


# ------------------------------------------------------------------ diff


def test_table_diff_matches_oracle(spark, sf_dir):
    """before = supplier; after = supplier with deterministic edits
    (drop %7==0, bump acctbal on %5==0, add shifted-key copies) —
    diff checked against a DuckDB full-outer twin."""
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    after = (
        sup.filter(F.col("s_suppkey") % 7 != 0)
        .withColumn(
            "s_acctbal",
            F.when(
                F.col("s_suppkey") % 5 == 0, F.col("s_acctbal") + 100.0
            ).otherwise(F.col("s_acctbal")),
        )
        .unionByName(
            sup.filter(F.col("s_suppkey") <= 3).select(
                (F.col("s_suppkey") + 100000).alias("s_suppkey"),
                "s_name",
                "s_acctbal",
            )
        )
    )
    got = {
        (r["s_suppkey"], r["change"])
        for r in table_diff(sup, after, ["s_suppkey"]).collect()
    }
    con = duckdb.connect()
    want = {
        (int(k), c)
        for k, c in con.execute(f"""
            WITH b AS (SELECT s_suppkey, s_name, s_acctbal
                       FROM read_parquet('{SUP}')),
            a AS (
              SELECT s_suppkey, s_name,
                     CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100.0
                          ELSE s_acctbal END AS s_acctbal
              FROM read_parquet('{SUP}') WHERE s_suppkey % 7 != 0
              UNION ALL
              SELECT s_suppkey + 100000, s_name, s_acctbal
              FROM read_parquet('{SUP}') WHERE s_suppkey <= 3
            )
            SELECT COALESCE(b.s_suppkey, a.s_suppkey) AS k,
                   CASE WHEN b.s_suppkey IS NULL THEN 'added'
                        WHEN a.s_suppkey IS NULL THEN 'removed'
                        WHEN NOT (b.s_name IS NOT DISTINCT FROM a.s_name
                              AND b.s_acctbal IS NOT DISTINCT FROM a.s_acctbal)
                        THEN 'changed' END AS c
            FROM b FULL OUTER JOIN a USING (s_suppkey)
            WHERE c IS NOT NULL
        """).fetchall()
    }
    assert got == want and got
    assert {c for _, c in got} == {"added", "removed", "changed"}


def test_table_diff_null_safe_and_structs(spark):
    b = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "y")], "k long, v string"
    )
    a = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "z")], "k long, v string"
    )
    rows = table_diff(b, a, ["k"]).collect()
    assert [(r["k"], r["change"]) for r in rows] == [(3, "changed")]
    assert rows[0]["before"]["v"] == "y" and rows[0]["after"]["v"] == "z"
    with pytest.raises(ValueError):
        table_diff(b.select("k"), a.select("k"), ["k"])


# ----------------------------------------------------------- expectations


def test_validate_expectations_one_pass(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rules = [
        expect_not_null("event_id"),
        expect_in_range("value", 0.0, 100.0),
        expect_in_set("event_type", ["reading", "click", "view", "purchase", "error"]),
        expect_matches("event_type", "^[a-z]+$"),
    ]
    rep = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in validate_expectations(ev, rules).collect()
    }
    n = ev.count()
    assert all(v[0] == n for v in rep.values())
    assert rep["not_null:event_id"] == (n, 0, True)
    # cross-check one rule against a direct filter count
    direct = ev.filter(~F.col("value").between(0.0, 100.0) | F.col("value").isNull()).count()
    assert rep["in_range:value[0.0,100.0]"][1] == direct
    with pytest.raises(ValueError):
        validate_expectations(ev, [])
    with pytest.raises(ValueError):
        validate_expectations(ev, [expect_not_null("value"), expect_not_null("value")])


def test_null_predicate_counts_as_violation(spark):
    df = spark.createDataFrame([(1, 5.0), (2, None)], "k long, v double")
    rep = validate_expectations(df, [expect_in_range("v", 0, 10)]).collect()[0]
    assert rep["n_violations"] == 1  # NULL v is a violation, not a pass


def test_expect_or_raise_gate(spark):
    df = spark.createDataFrame([(1, -5.0)], "k long, v double")
    with pytest.raises(ValueError, match="in_range:v"):
        expect_or_raise(df, [expect_in_range("v", 0, 10)])
    expect_or_raise(df, [expect_not_null("v")])  # passes silently


def test_expect_unique_and_references(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    assert expect_unique(sup, ["s_suppkey"]).count() == 0
    dup = sup.unionByName(sup.limit(2))
    bad = expect_unique(dup, ["s_suppkey"]).collect()
    assert len(bad) == 2 and all(r["n"] == 2 for r in bad)
    assert expect_references(sup, "s_nationkey", nat, "n_nationkey").count() == 0
    broken = sup.withColumn(
        "s_nationkey",
        F.when(F.col("s_suppkey") % 9 == 0, F.lit(999)).otherwise(
            F.col("s_nationkey")
        ),
    )
    n_bad = expect_references(broken, "s_nationkey", nat, "n_nationkey").count()
    assert n_bad == sup.filter("s_suppkey % 9 = 0").count()


def test_empty_frame_passes_gate(spark):
    """An empty batch (routine for a pre-landing gate) passes every
    rule with 0 rows / 0 violations — F.sum's NULL-over-zero-rows must
    not crash the gate (review-found)."""
    df = spark.createDataFrame([], "k long, v double")
    rep = validate_expectations(
        df, [expect_not_null("v"), expect_in_range("v", 0, 1)]
    ).collect()
    assert all(r["n_rows"] == 0 and r["n_violations"] == 0 and r["passed"] for r in rep)
    expect_or_raise(df, [expect_not_null("v")])  # no raise


def test_expect_schema_gate(spark):
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dataops import (
        expect_schema,
    )

    df = spark.createDataFrame([(1, 2.0)], "id long, value double")
    expect_schema(df, "id BIGINT, value DOUBLE")  # passes
    expect_schema(df, "value DOUBLE, id BIGINT")  # order-insensitive
    with pytest.raises(ValueError, match="order"):
        expect_schema(df, "value DOUBLE, id BIGINT", ignore_order=False)
    with pytest.raises(ValueError, match="missing column extra"):
        expect_schema(df, "id BIGINT, value DOUBLE, extra STRING")
    with pytest.raises(ValueError, match="value: double != expected int"):
        expect_schema(df, "id BIGINT, value INT")
    with pytest.raises(ValueError, match="unexpected column value"):
        expect_schema(df, "id BIGINT")


def test_expect_freshness_gate(spark):
    import datetime as dt

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dataops import (
        expect_freshness,
    )

    now = dt.datetime(2024, 1, 2, 0, 0, 0)
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 23, 0, 0))], "id long, ts timestamp"
    )
    expect_freshness(df, "ts", 2 * 3600, now)  # 1h old, limit 2h
    with pytest.raises(ValueError, match="3600s old"):
        expect_freshness(df, "ts", 1800, now)
    empty = spark.createDataFrame([], "id long, ts timestamp")
    with pytest.raises(ValueError, match="no rows"):
        expect_freshness(empty, "ts", 3600, now)


def test_expect_schema_duplicate_columns_flagged(spark):
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dataops import (
        expect_schema,
    )

    a = spark.createDataFrame([(1, 2.0)], "id long, value double")
    b = spark.createDataFrame([(1, "x")], "id long, name string")
    joined = a.join(b, a.id == b.id)  # carries id twice
    with pytest.raises(ValueError, match="duplicate column id"):
        expect_schema(joined, "id BIGINT, value DOUBLE, name STRING")


def test_expect_freshness_aware_now(spark):
    import datetime as dt

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dataops import (
        expect_freshness,
    )

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 23, 0, 0))], "id long, ts timestamp"
    )
    aware_now = dt.datetime(2024, 1, 2, 0, 0, 0, tzinfo=dt.timezone.utc)
    expect_freshness(df, "ts", 2 * 3600, aware_now)  # aware clock works
    with pytest.raises(ValueError, match="3600s old"):
        expect_freshness(df, "ts", 1800, aware_now)
