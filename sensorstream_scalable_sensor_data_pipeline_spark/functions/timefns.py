"""Time scalar functions (F1, F3, F6 in SURVEY §2.9).

The reference converts epoch-ms with ``to_timestamp(col("t_stamp") /
1000)`` (main_pipeline.py:198) — a *double* division that loses
sub-millisecond exactness for epochs beyond 2^53 µs and round-trips
through a fractional-seconds parse. The exact Spark-native form is
``timestamp_millis`` / ``unix_millis`` (both integer-domain); we use
those.

Timezone semantics (F3): the pandas prototype pins them precisely —
epoch ms interpreted as UTC, converted to a fixed site timezone,
stored tz-naive (Initial pipeline with pandas.txt:179). The Spark
reference silently diverges (naive ``/1000``). This engine makes the
site timezone an explicit parameter with the prototype's semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The prototype's fixed site timezone (Initial pipeline with pandas.txt:179).
DEFAULT_SITE_TZ = "America/Bogota"


def epoch_ms_to_timestamp(col: Column | str) -> Column:
    """F1: epoch milliseconds (LONG) → TIMESTAMP, integer-exact."""
    return F.timestamp_millis(F.col(col) if isinstance(col, str) else col)


def timestamp_to_epoch_ms(col: Column | str) -> Column:
    """F6 inverse: TIMESTAMP → epoch milliseconds (LONG)."""
    return F.unix_millis(F.col(col) if isinstance(col, str) else col)


def to_site_time(col: Column | str, tz: str = DEFAULT_SITE_TZ) -> Column:
    """F3: UTC instant → wall-clock in ``tz``, stored tz-naive
    (`from_utc_timestamp` reproduces pandas' tz_convert+tz_localize(None))."""
    return F.from_utc_timestamp(F.col(col) if isinstance(col, str) else col, tz)
