"""Predicate operators (P4-P8 in SURVEY §2.2).

All are single Catalyst ``Filter`` nodes — they push down into the
parquet scan (min/max row-group skipping for range predicates,
dictionary filtering for equality/IN) or into JDBC. The reference
instead *hand-builds SQL strings* for its pushed predicates
(main_pipeline.py:296-300, 343-350); expressing them as DataFrame
filters gets the same pushdown from Catalyst without string plumbing
(SURVEY §4 X8).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def integrity_filter(df: DataFrame, col: str = "dataintegrity") -> DataFrame:
    """P4: drop invalid readings — ``dataintegrity != 0``
    (main_pipeline.py:197)."""
    return df.filter(F.col(col) != 0)


def eq_filter(df: DataFrame, col: str, value) -> DataFrame:
    """P5: per-key slice, e.g. one sensor's rows (main_pipeline.py:313)."""
    return df.filter(F.col(col) == F.lit(value))


def range_filter(df: DataFrame, col: str, low=None, high=None) -> DataFrame:
    """P6: cutoff predicates — ``t_stamp >= cutoff`` and friends
    (main_pipeline.py:296-300). Pushed to the scan; on a
    (year, month)-partitioned layout this also prunes partitions."""
    if low is not None:
        df = df.filter(F.col(col) >= F.lit(low))
    if high is not None:
        df = df.filter(F.col(col) < F.lit(high))
    return df


def in_list_filter(df: DataFrame, col: str, values: list) -> DataFrame:
    """P7: IN-list for a *small, driver-known* value set
    (main_pipeline.py:296-298). For match sets that are themselves
    query results, use ``enrich.semi_filter`` instead — never collect
    ids to the driver just to re-embed them in a predicate."""
    return df.filter(F.col(col).isin(values))


def regex_filter(df: DataFrame, col: str, patterns: list[str]) -> DataFrame:
    """P8: OR-fold of regex predicates selecting sensors by tagpath
    pattern (main_pipeline.py:343-350, Postgres ``~`` operator)."""
    if not patterns:
        raise ValueError("at least one pattern required")
    cond = reduce(
        lambda acc, p: acc | F.col(col).rlike(p),
        patterns[1:],
        F.col(col).rlike(patterns[0]),
    )
    return df.filter(cond)
