"""Query plans: the engine's public query surface.

Importing this package registers every query into the registry that
``__spark_entry__.py`` exposes to the correctness driver. One
registered query per SURVEY.md §2 inventory row, plus the pipeline
flagship, benchmark heads, and the §2.12 extension operators.
"""

from sensorstream_scalable_sensor_data_pipeline_spark.plans.registry import (
    all_oracles,
    all_queries,
    get,
)

# Side-effect imports: each module registers its queries.
from sensorstream_scalable_sensor_data_pipeline_spark.plans import relational  # noqa: E402,F401
from sensorstream_scalable_sensor_data_pipeline_spark.plans import pipeline  # noqa: E402,F401
from sensorstream_scalable_sensor_data_pipeline_spark.plans import analytics  # noqa: E402,F401
from sensorstream_scalable_sensor_data_pipeline_spark.plans import text  # noqa: E402,F401
from sensorstream_scalable_sensor_data_pipeline_spark.plans import dedup  # noqa: E402,F401
from sensorstream_scalable_sensor_data_pipeline_spark.plans import similarity  # noqa: E402,F401
from sensorstream_scalable_sensor_data_pipeline_spark.plans import multimodal  # noqa: E402,F401
from sensorstream_scalable_sensor_data_pipeline_spark.plans import streaming_queries  # noqa: E402,F401

__all__ = ["all_queries", "all_oracles", "get"]
