"""Scalar/aggregate function helpers shared by operators and plans."""

from sensorstream_scalable_sensor_data_pipeline_spark.functions.timefns import (
    epoch_ms_to_timestamp,
    timestamp_to_epoch_ms,
    to_site_time,
)
from sensorstream_scalable_sensor_data_pipeline_spark.functions.aggfns import dsum, davg
from sensorstream_scalable_sensor_data_pipeline_spark.functions.strings import flatten_tagpath

__all__ = [
    "epoch_ms_to_timestamp",
    "timestamp_to_epoch_ms",
    "to_site_time",
    "dsum",
    "davg",
    "flatten_tagpath",
]
