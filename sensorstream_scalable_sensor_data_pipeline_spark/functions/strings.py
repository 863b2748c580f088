"""String scalar functions (F4, F5 in SURVEY §2.9).

The reference flattens hierarchical tagpaths driver-side with
``tagpath.replace("/", "_")`` for file/column naming
(main_pipeline.py:309-311); here it is a column expression so the
rename happens distributed, inside codegen, not in a driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def flatten_tagpath(col: Column | str) -> Column:
    """F5: ``sensor/module/temp_1`` → ``sensor_module_temp_1``."""
    return F.translate(_c(col), "/", "_")


def ci_rlike(col: Column | str, pattern: str) -> Column:
    """F4: case-insensitive regex match (prototype uses
    ``str.contains(case=False)``, Initial pipeline with pandas.txt:61;
    Spark spells it with an inline ``(?i)`` flag)."""
    return _c(col).rlike(f"(?i){pattern}")
