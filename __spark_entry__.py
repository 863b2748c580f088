"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship sensor-pipeline query at sf0.001;
``queries``/``oracle_sql`` expose the engine's registered query
surface (one entry per implemented SURVEY.md §2 operator row, plus
the §2.12 extensions). See
``sensorstream_scalable_sensor_data_pipeline_spark/plans/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sensorstream_scalable_sensor_data_pipeline_spark import plans  # noqa: E402
from sensorstream_scalable_sensor_data_pipeline_spark.plans.pipeline import (  # noqa: E402
    sensor_series,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return sensor_series(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return plans.all_oracles()
