"""Backfill planning (backfill.py) and manifest integrity checks
(sources/writers.py)."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.backfill import (
    existing_months,
    expected_months,
    plan_backfill,
    verify_complete,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.writers import (
    verify_manifest,
    write_partitioned,
    write_with_manifest,
)


# ---------------------------------------------------------------- backfill


def test_expected_months_spans_years():
    got = expected_months(dt.date(2023, 11, 15), dt.date(2024, 2, 1))
    assert got == [(2023, 11), (2023, 12), (2024, 1), (2024, 2)]
    with pytest.raises(ValueError):
        expected_months(dt.date(2024, 2, 1), dt.date(2024, 1, 1))


@pytest.fixture()
def layout(spark, tmp_path):
    """Nested tagpath/year/month layout with 2024-02 and 2024-04
    missing."""
    rows = [
        ("s1", dt.datetime(2024, m, 10), float(m))
        for m in (1, 3, 5)
    ]
    df = spark.createDataFrame(rows, "tagpath string, ts timestamp, v double")
    df = df.withColumn("year", F.year("ts")).withColumn("month", F.month("ts"))
    p = str(tmp_path / "state")
    write_partitioned(df, p, ["tagpath", "year", "month"])
    return p


def test_existing_and_plan(spark, layout):
    assert existing_months(layout) == {(2024, 1), (2024, 3), (2024, 5)}
    plan = plan_backfill(layout, dt.date(2024, 1, 1), dt.date(2024, 5, 31))
    assert plan == [
        (dt.datetime(2024, 2, 1), dt.datetime(2024, 3, 1)),
        (dt.datetime(2024, 4, 1), dt.datetime(2024, 5, 1)),
    ]
    # coalescing: a 3-month hole chunks by chunk_months
    plan2 = plan_backfill(
        layout, dt.date(2024, 1, 1), dt.date(2024, 8, 31), chunk_months=2
    )
    assert plan2 == [
        (dt.datetime(2024, 2, 1), dt.datetime(2024, 3, 1)),
        (dt.datetime(2024, 4, 1), dt.datetime(2024, 5, 1)),
        (dt.datetime(2024, 6, 1), dt.datetime(2024, 8, 1)),
        (dt.datetime(2024, 8, 1), dt.datetime(2024, 9, 1)),
    ]
    assert plan_backfill(layout, dt.date(2024, 3, 1), dt.date(2024, 3, 5)) == []
    with pytest.raises(ValueError):
        plan_backfill(layout, dt.date(2024, 1, 1), dt.date(2024, 2, 1), 0)


def test_verify_complete_gate(spark, layout):
    verify_complete(spark, layout, dt.date(2024, 3, 1), dt.date(2024, 3, 31))
    with pytest.raises(RuntimeError, match="2024-02"):
        verify_complete(spark, layout, dt.date(2024, 1, 1), dt.date(2024, 3, 31))


# ---------------------------------------------------------------- manifest


def test_manifest_roundtrip_and_detection(spark, sf_dir, tmp_path):
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").repartition(4)
    p = str(tmp_path / "ev")
    m = write_with_manifest(ev, p, max_records_per_file=300)
    assert m["rows"] == ev.count()
    assert verify_manifest(spark, p) == m  # clean read-back passes

    # lose one of several files -> row-count mismatch raises
    files = sorted(glob.glob(os.path.join(p, "part-*.parquet")))
    assert len(files) > 1
    os.remove(files[0])
    with pytest.raises(RuntimeError, match="rows"):
        verify_manifest(spark, p)


def test_manifest_missing_raises(spark, sf_dir, tmp_path):
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

    p = str(tmp_path / "plain")
    load_table(spark, sf_dir, "region").write.parquet(p)
    with pytest.raises(RuntimeError, match="_manifest"):
        verify_manifest(spark, p)


def test_vacuum_months(spark, layout):
    from sensorstream_scalable_sensor_data_pipeline_spark.backfill import (
        existing_months,
        vacuum_months,
    )

    # dry run reports without deleting
    doomed = vacuum_months(layout, dt.date(2024, 4, 1))
    assert doomed == [(2024, 1), (2024, 3)]
    assert existing_months(layout) == {(2024, 1), (2024, 3), (2024, 5)}
    # real run deletes exactly those months, keeps the rest readable
    assert vacuum_months(layout, dt.date(2024, 4, 1), dry_run=False) == doomed
    assert existing_months(layout) == {(2024, 5)}
    assert spark.read.parquet(layout).count() == 1
    assert vacuum_months(layout, dt.date(2024, 4, 1), dry_run=False) == []


def test_compact_with_zorder_recluster(spark, tmp_path):
    from pyspark.sql import functions as F

    from sensorstream_scalable_sensor_data_pipeline_spark.sources.writers import (
        compact_parquet_dir,
    )

    n = 64
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    p = str(tmp_path / "t")
    df.repartition(24).write.parquet(p)  # fragmented layout
    before, after = compact_parquet_dir(
        spark, p, target_records_per_file=1024, zorder_cols=["x", "y"],
        zorder_bits=6,
    )
    # sampled range boundaries are approximately even, so a partition
    # slightly over target splits: assert the compaction effect, not
    # an exact file count
    assert before == 24 and after <= 7
    back = spark.read.parquet(p)
    assert back.count() == n * n
    assert back.agg(F.sum("x"), F.sum("y")).collect() == df.agg(
        F.sum("x"), F.sum("y")
    ).collect()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compact_parquet_dir(spark, p, sort_col="x", zorder_cols=["x", "y"])
