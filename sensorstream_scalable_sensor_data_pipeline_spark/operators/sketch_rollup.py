"""Mergeable distinct-count sketch tables — incremental HLL rollups
(§2.12 extension; the Datasketches-backed production tier of
operators/sketches.py's teaching-shape HLL).

The 100 TB pattern: you cannot afford to re-scan history every time
someone asks "distinct users this month". Instead, maintain a SKETCH
TABLE at a fine grain (e.g. one HLL sketch per day) — each increment
scans only its own day — and answer ANY coarser-grain question by
merging sketches: month = union of ~30 sketches, all-time = union of
all of them, each merge a few KB per row instead of a raw re-scan.
HLL union is lossless over register maxima, so a rolled-up estimate
IS the estimate the one-shot sketch would give — order- and
batch-insensitive (pinned in tests).

Spark 3.5+ ships the Apache DataSketches HLL as native expressions
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) —
JVM-side, map-side partially aggregated, the sketch travels as a
``binary`` column any parquet table can persist. This module is the
thin discipline layer: build at fine grain, persist, merge at query
time; never re-aggregate raw data for a coarser distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: log2 of HLL registers: 12 → 4096 registers, ~1.6% relative
#: standard error, ~4 KB per sketch at most.
DEFAULT_LGK = 12


def build_distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Fine-grain sketch table: one row per group carrying the HLL
    sketch of ``value_col``'s distinct values plus the exact row
    count — (group_cols..., sketch, n_rows). One map-side-combined
    hash aggregate; the shuffle carries sketches, not values."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(int(lgk))).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_distinct_sketches(
    sketches: DataFrame,
    rollup_cols: list[str],
) -> DataFrame:
    """Answer a coarser-grain distinct question FROM the sketch table
    (never from raw data): groups collapse via lossless HLL union —
    (rollup_cols..., sketch, n_rows, approx_distinct). The result is
    itself a sketch table, so rollups chain (day → month → year).
    Pass ``rollup_cols=[]`` for the global estimate (one row)."""
    gb = sketches.groupBy(*rollup_cols) if rollup_cols else sketches.groupBy()
    merged = gb.agg(
        F.hll_union_agg("sketch").alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.withColumn(
        "approx_distinct", F.hll_sketch_estimate("sketch").cast("long")
    )


def sketch_estimate(sketch: Column) -> Column:
    """Point estimate off a persisted sketch column."""
    return F.hll_sketch_estimate(sketch).cast("long")
