"""sensorstream_scalable_sensor_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic-Spark re-expression of the capabilities of
SharmaKanishkaa/SensorStream-Scalable-Sensor-Data-Pipeline (reference
surveyed in SURVEY.md): typed time-series ingestion, dimension
enrichment, quality filtering, incremental dedup'd materialization,
per-key pivoted output — plus the LLM-data-pipeline extension
operators (dedup families, similarity search, text analysis,
multimodal column plumbing).

Design stance (SURVEY.md §7): declarative DataFrame/SQL plans that
Catalyst/Tungsten optimize; shuffles minimized (broadcast dims,
partial aggregation); filters/projections pushed to the parquet scan;
Python only in Arrow-batched Pandas UDFs where built-ins genuinely
cannot express the semantics.
"""

__version__ = "0.1.0"

from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark, prepare_session

__all__ = ["get_spark", "prepare_session", "__version__"]
