"""Semi-structured extraction (operators/semistructured.py) over the
events.props JSON column, DuckDB-oracled, plus quarantine/flatten
behavior."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.semistructured import (
    extract_json_fields,
    flatten_struct,
    infer_json_schema,
    parse_json_col,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
EV = os.path.join(SF_DIR, "events.parquet")


def test_extract_json_fields_matches_oracle(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        r["event_id"]: r["k"]
        for r in extract_json_fields(
            ev, "props", {"k": ("$.k", "long")}
        ).select("event_id", "k").collect()
    }
    con = duckdb.connect()
    want = {
        int(e): (int(k) if k is not None else None)
        for e, k in con.execute(f"""
            SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT)
            FROM read_parquet('{EV}')
        """).fetchall()
    }
    con.close()
    assert got == want
    assert any(v is not None for v in got.values())
    with pytest.raises(ValueError):
        extract_json_fields(ev, "props", {})


def test_extract_missing_path_and_bad_type_null(spark):
    df = spark.createDataFrame(
        [(1, '{"a": "xyz"}'), (2, '{"b": 5}')], "id long, j string"
    )
    out = extract_json_fields(
        df, "j", {"a_num": ("$.a", "long"), "b": ("$.b", "long")}
    ).collect()
    rows = {r["id"]: (r["a_num"], r["b"]) for r in out}
    assert rows[1] == (None, None)  # non-numeric cast + absent path
    assert rows[2] == (None, 5)


def test_parse_json_col_quarantine(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 3}'), (2, "not json"), (3, None)], "id long, j string"
    )
    out = {
        r["id"]: (r["parsed"], r["_corrupt"])
        for r in parse_json_col(df, "j", "k long").collect()
    }
    assert out[1][0]["k"] == 3 and out[1][1] is False
    assert out[2][0] is None and out[2][1] is True  # quarantine row
    assert out[3][0] is None and out[3][1] is False  # NULL in, not corrupt


def test_infer_schema_bootstrap(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    schema = infer_json_schema(spark, ev, "props", sample_rows=50)
    assert "k" in schema.fieldNames()
    parsed = parse_json_col(ev, "props", schema)
    assert parsed.filter("_corrupt").count() == 0


def test_flatten_struct(spark):
    df = spark.createDataFrame([(1, ("x", 2))], "id long, s struct<a string, b long>")
    out = flatten_struct(df, "s")
    assert out.columns == ["id", "s_a", "s_b"]
    r = out.collect()[0]
    assert (r["s_a"], r["s_b"]) == ("x", 2)
    with pytest.raises(ValueError):
        flatten_struct(df, "id")
