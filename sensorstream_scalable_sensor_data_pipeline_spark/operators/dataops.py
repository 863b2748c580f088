"""Data-ops tooling: snapshot diffs and declarative expectation
gates (§2.12 extensions — the operational shell around the pipeline).

The reference validates schemas on ingest (SURVEY §2 P2/P3); real
deployments also need (a) "what changed between yesterday's table and
today's?" — migration validation, silent-upstream-change detection,
CDC without a log — and (b) "does this batch meet its contract?" —
the dbt-test / Great-Expectations-style gate that blocks a bad batch
before it lands.

Both are pure DataFrame composition:

* :func:`table_diff` — one full-outer join on the key, NULL-safe
  struct comparison over the compared columns; emits only differing
  rows tagged added/removed/changed. Cost: one co-partitioned join —
  at 100 TB run it per-partition-slice (compose with the partition
  filters) or on bucketed tables (sources/writers.py) where it
  shuffles nothing.
* :func:`validate_expectations` — every rule compiles into ONE shared
  aggregate pass (no per-rule jobs): each check contributes a
  conditional-count column, so a 30-rule contract costs one scan.
  Returns a per-rule report frame; :func:`expect_or_raise` is the
  gate form (raise on any violation, with counts in the message).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_diff(
    before: DataFrame,
    after: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff keyed on ``key_cols``: (keys..., change,
    before, after) where ``change`` ∈ added|removed|changed and
    before/after are structs of the compared columns (NULL on the
    missing side). Unchanged rows are absent. Comparison is NULL-safe
    per column (NULL == NULL), so nullable columns never false-flag.
    ``compare_cols`` defaults to every shared non-key column."""
    if compare_cols is None:
        shared = [c for c in before.columns if c in set(after.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    if not compare_cols:
        raise ValueError("no columns to compare")
    b = before.select(
        *key_cols, F.struct(*compare_cols).alias("_b"), F.lit(1).alias("_inb")
    )
    a = after.select(
        *key_cols, F.struct(*compare_cols).alias("_a"), F.lit(1).alias("_ina")
    )
    j = b.join(a, key_cols, "full_outer")
    same = F.struct(
        *[F.col("_b")[c].alias(c) for c in compare_cols]
    ).eqNullSafe(F.struct(*[F.col("_a")[c].alias(c) for c in compare_cols]))
    change = (
        F.when(F.col("_inb").isNull(), F.lit("added"))
        .when(F.col("_ina").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *key_cols,
            "change",
            F.col("_b").alias("before"),
            F.col("_a").alias("after"),
        )
    )


@dataclass(frozen=True)
class Expectation:
    """One declarative rule: ``name`` labels the report row;
    ``predicate`` is a boolean Column that must hold for EVERY row
    (violations = rows where it is false or NULL)."""

    name: str
    predicate: Column


def expect_not_null(col: str) -> Expectation:
    return Expectation(f"not_null:{col}", F.col(col).isNotNull())


def expect_in_range(col: str, lo: float, hi: float) -> Expectation:
    return Expectation(
        f"in_range:{col}[{lo},{hi}]", F.col(col).between(lo, hi)
    )


def expect_matches(col: str, pattern: str) -> Expectation:
    return Expectation(
        f"matches:{col}", F.col(col).rlike(pattern)
    )


def expect_in_set(col: str, values: list) -> Expectation:
    return Expectation(f"in_set:{col}", F.col(col).isin(values))


def validate_expectations(
    df: DataFrame, rules: list[Expectation]
) -> DataFrame:
    """Evaluate every row-level rule in ONE aggregate pass: returns
    (rule, n_rows, n_violations, passed). A violation is a row where
    the predicate is false OR NULL (an unevaluable contract is a
    broken contract — NULL-in ≠ pass)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(
            F.when(~F.coalesce(r.predicate, F.lit(False)), 1).otherwise(0)
        ).alias(f"_v{i}")
        for i, r in enumerate(rules)
    ]
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    # F.sum over ZERO rows is NULL: an empty frame has no violations
    # (the gate must pass trivially-good empty batches, not crash)
    report = [
        (r.name, int(row["_n"]), int(row[f"_v{i}"] or 0))
        for i, r in enumerate(rules)
    ]
    from sensorstream_scalable_sensor_data_pipeline_spark.functions.localframe import (
        tiny_local_frame,
    )

    return tiny_local_frame(
        df.sparkSession,
        [(n, t, v, v == 0) for n, t, v in report],
        "rule string, n_rows long, n_violations long, passed boolean",
    )


def expect_or_raise(df: DataFrame, rules: list[Expectation]) -> None:
    """The gate form: raise ``ValueError`` naming every failed rule
    with its violation count; pass silently otherwise."""
    bad = [
        (r["rule"], r["n_violations"])
        for r in validate_expectations(df, rules).collect()
        if not r["passed"]
    ]
    if bad:
        detail = ", ".join(f"{n} ({v} rows)" for n, v in bad)
        raise ValueError(f"expectation gate failed: {detail}")


def expect_unique(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Key-uniqueness check (needs its own aggregate — uniqueness is
    not row-local): returns the duplicated key values with counts;
    empty frame = contract holds. One hash aggregate."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def expect_references(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """Referential-integrity check: rows of ``df`` whose ``col`` has
    no match in ``dim.dim_col`` (NULLs pass — compose with
    expect_not_null to forbid them). One broadcastable anti-join."""
    return df.filter(F.col(col).isNotNull()).join(
        F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct()),
        col,
        "left_anti",
    )


def expect_schema(
    df: DataFrame,
    expected_ddl: str,
    ignore_order: bool = True,
) -> None:
    """Schema-contract gate: raise naming every missing / unexpected /
    retyped column when ``df`` deviates from the DDL string (e.g.
    ``"id BIGINT, value DOUBLE"``). ``ignore_order`` compares as a
    set (column order is presentation, not contract, for columnar
    formats); pass False to pin order too. Pure driver-side metadata —
    no job runs."""
    from collections import Counter

    from pyspark.sql.types import StructType

    expected = StructType.fromDDL(expected_ddl)
    problems = []
    # duplicate names (post-join frames) would silently collapse in a
    # dict and slip past the gate (review-found) — catch them first
    name_counts = Counter(f.name for f in df.schema.fields)
    for name, c in sorted(name_counts.items()):
        if c > 1:
            problems.append(f"duplicate column {name} (x{c})")
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in expected.fields}
    for name in want:
        if name not in got:
            problems.append(f"missing column {name}")
        elif got[name] != want[name]:
            problems.append(f"{name}: {got[name]} != expected {want[name]}")
    for name in got:
        if name not in want:
            problems.append(f"unexpected column {name}")
    if not problems and not ignore_order:
        go = [f.name for f in df.schema.fields]
        wo = [f.name for f in expected.fields]
        if go != wo:
            problems.append(f"column order {go} != expected {wo}")
    if problems:
        raise ValueError("schema gate failed: " + "; ".join(problems))


def expect_freshness(
    df: DataFrame,
    time_col: str,
    max_age_seconds: int,
    now,
) -> None:
    """Staleness gate: raise when the newest ``time_col`` value is
    older than ``max_age_seconds`` before ``now`` (a datetime the
    CALLER supplies — an explicit clock keeps runs replayable and
    tests deterministic), or when the frame is empty (no data is the
    stalest data). One scalar MAX aggregate.

    The age is computed INSIDE Spark (``unix_micros`` of both sides),
    never by subtracting a collected timestamp on the driver: a
    collected TimestampType converts through the driver's OS
    timezone, which skews the age by the UTC offset, and a tz-aware
    ``now`` would TypeError against the naive result (review-found).
    ``now`` may be tz-aware (exact instant) or naive (interpreted in
    the Spark session timezone — UTC under this engine's session)."""
    row = df.agg(
        F.max(time_col).alias("m"),
        (
            (F.unix_micros(F.lit(now)) - F.unix_micros(F.max(time_col)))
            / F.lit(1_000_000.0)
        ).alias("age_s"),
    ).collect()[0]
    if row["m"] is None:
        raise ValueError(f"freshness gate failed: no rows / all-NULL {time_col}")
    if row["age_s"] > max_age_seconds:
        raise ValueError(
            f"freshness gate failed: newest {time_col} is "
            f"{row['age_s']:.0f}s old (limit {max_age_seconds}s)"
        )
