"""Exact deduplication (D1, D2 in SURVEY §2.8).

* ``key_dedup`` — the reference's idempotency primitive:
  ``dropDuplicates(["datetime"])`` before every write
  (main_pipeline.py:328; Param PDF p.7 §9). ``dropDuplicates`` keeps
  an *arbitrary* survivor among duplicates; when downstream needs a
  deterministic survivor (oracle comparisons, reproducible pipelines)
  use ``key_dedup_deterministic``, which picks min/max by a tiebreak
  column via one hash aggregation (same shuffle shape, deterministic
  result).
* ``full_dedup`` — the prototype's whole-row ``drop_duplicates()``
  (Initial pipeline with pandas.txt:186) → ``distinct()``.

Scale note: both are single hash-shuffles on the dedup key with
map-side partial aggregation; skewed keys are handled by AQE. For
streams, the same contract is ``dropDuplicatesWithinWatermark``
(streaming/pipeline.py) so state stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_dedup(df: DataFrame, keys: list[str]) -> DataFrame:
    """D1: one surviving row per key tuple (arbitrary survivor)."""
    return df.dropDuplicates(keys)


def key_dedup_deterministic(
    df: DataFrame, keys: list[str], order_col: str, keep: str = "min"
) -> DataFrame:
    """D1 with a defined survivor: the row whose ``order_col`` is the
    group min (or max). Implemented as a struct-min aggregation —
    one shuffle, no window sort."""
    agg = F.min if keep == "min" else F.max
    others = [c for c in df.columns if c not in keys]
    packed = agg(F.struct(order_col, *[c for c in others if c != order_col])).alias("_s")
    out = df.groupBy(*keys).agg(packed)
    return out.select(*keys, *[F.col(f"_s.{c}").alias(c) for c in [order_col] + [c for c in others if c != order_col]])


def full_dedup(df: DataFrame) -> DataFrame:
    """D2: whole-row distinct."""
    return df.distinct()
