"""The t2 gate, locally: every registered query with an oracle must
hash-match DuckDB on the same tables. Parametrized over the whole
registry so adding a query automatically adds its check."""

from __future__ import annotations

import pytest

from sensorstream_scalable_sensor_data_pipeline_spark import plans
from tests.oracle_check import assert_frames_match

ORACLES = plans.all_oracles()
QUERIES = plans.all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    ddf = duck.sql(ORACLES[name]).df()
    assert_frames_match(sdf, ddf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"tagpath", "datetime", "sensor_value", "sensor_id"}
