"""Sources & sinks: typed readers, testdata table loader, sized writers."""

from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table, TABLES

__all__ = ["load_table", "TABLES"]
