"""Event-sequence (funnel) matching — CEP-lite over keyed event
streams (§2.12 custom operators: Spark has no MATCH_RECOGNIZE / Flink
CEP equivalent), composed from the engine's own as-of join.

The question every clickstream/sensor product asks: per key, which
occurrences of step N were preceded by step N−1, preceded by step
N−2, …, all within a time budget — view → click → purchase funnels,
arm → trigger → alarm sequences, error escalation chains.

Semantics — **last-touch backward matching**, the standard funnel
convention: anchor on each occurrence of the FINAL step, attach the
LATEST occurrence of the previous step at-or-before it (inclusive ≤,
the as-of convention shared with DuckDB's native ASOF JOIN, which is
the test oracle), then the latest of the step before that
at-or-before *that*, and so on. Each final-step event yields at most
one chain; chain timestamps are non-increasing backwards by
construction, so ordering never needs re-checking. ``within_seconds``
bounds first-to-last span. Gaps are allowed (other events may
interleave) — that is what distinguishes a funnel from substring
matching.

Scale shape: n−1 as-of joins, each ONE hash-partitioned keyed window
(operators/asof.py's union+window trick) over only the two steps'
rows — never the full stream, never a cross product, no collected
per-key arrays. A 3-step funnel over 100 TB of events is three keyed
window passes over filtered slices; the hot-key escape hatch engages
AUTOMATICALLY (r11): a density pre-flight over the steps-filtered
slice routes every pass through asof_join_bucketed when one key
dominates (``bucket_seconds="auto"``, the default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.asof import (
    asof_join,
    asof_join_bucketed,
    hot_key_bucket_seconds,
)


def funnel_match(
    events: DataFrame,
    on: str,
    time_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
    bucket_seconds: int | str | None = "auto",
) -> DataFrame:
    """Completed last-touch chains: one row per final-step event whose
    full backward chain exists (and fits ``within_seconds`` when
    given), with columns ``on, ts_0 … ts_{n-1}`` — ``ts_i`` the
    matched time of ``steps[i]``, non-decreasing in ``i``.

    ``bucket_seconds`` routes the hot-key escape hatch (the module
    docstring's 100 TB claim, made real in r11): the default
    ``"auto"`` runs ONE density pre-flight over the steps-filtered
    slice (:func:`~...asof.hot_key_bucket_seconds` — a superset of
    every pass's union, so a key hot in any pass is profiled) and,
    when some key exceeds the target, runs every as-of pass through
    :func:`~...asof.asof_join_bucketed` with the measured size — a
    100× clickstream's one-hot-user/bot key splits into independent
    per-bucket sorts instead of one task's funnel. ``None`` pins the
    plain single-window path (skip the pre-flight); an int pins the
    bucketed path with that size. All three routes are
    output-equivalent (skew-equivalence pinned in tests).

    NOTE the default makes plan construction EAGER: the pre-flight is
    one Spark job (a map-side-combined aggregate over the
    steps-filtered slice) that runs when ``funnel_match`` is CALLED,
    not when its result is executed — callers that only build or
    explain plans, or whose upstream is expensive and uncached, pay
    that one pass up front. Pass ``bucket_seconds=None`` to stay
    fully lazy, or cache the events first."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    for a, b in zip(steps, steps[1:]):
        if a == b:
            raise ValueError(
                "consecutive identical steps would self-match under the "
                "inclusive as-of convention; use distinct adjacent steps"
            )
    if within_seconds is not None and within_seconds < 0:
        raise ValueError("within_seconds must be non-negative")
    n = len(steps)
    if bucket_seconds == "auto":
        bucket_seconds = hot_key_bucket_seconds(
            events.filter(F.col(type_col).isin(steps)).select(on, time_col),
            on,
            time_col,
        )
    cur = events.filter(F.col(type_col) == steps[-1]).select(
        on, F.col(time_col).alias(f"ts_{n - 1}")
    )
    for i in range(n - 2, -1, -1):
        prior = events.filter(F.col(type_col) == steps[i]).select(
            on,
            F.col(time_col).alias("_t"),
            F.col(time_col).alias(f"ts_{i}"),
        )
        # anchor the as-of on the NEXT step's matched time
        if bucket_seconds is None:
            joined = asof_join(
                cur.withColumnRenamed(f"ts_{i + 1}", "_t"),
                prior,
                on=on,
                time_col="_t",
                value_cols=[f"ts_{i}"],
            )
        else:
            joined = asof_join_bucketed(
                cur.withColumnRenamed(f"ts_{i + 1}", "_t"),
                prior,
                on=on,
                time_col="_t",
                value_cols=[f"ts_{i}"],
                bucket_seconds=bucket_seconds,
            )
        cur = joined.withColumnRenamed("_t", f"ts_{i + 1}")
    out = cur.filter(F.col("ts_0").isNotNull())
    if within_seconds is not None:
        out = out.filter(
            F.unix_micros(F.col(f"ts_{n - 1}")) - F.unix_micros(F.col("ts_0"))
            <= within_seconds * 1_000_000
        )
    return out.select(on, *[f"ts_{i}" for i in range(n)])


def funnel_counts(
    events: DataFrame,
    on: str,
    time_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """The classic funnel report: for each step PREFIX of ``steps``,
    how many completed chains exist — one row per depth, columns
    ``(depth, step, n_chains, n_keys)``. Depth 1 is simply the count
    of first-step events (every occurrence is a length-1 chain).
    ``n_keys`` is monotone non-increasing in depth (a key owning a
    depth-d chain owns every prefix chain); ``n_chains`` is NOT —
    chains anchor on the d-th step's occurrences, which can outnumber
    shallower steps' events. n−1 as-of passes total (each prefix
    reuses nothing from the others — the anchors differ — but every
    pass is the same keyed-window cost as :func:`funnel_match`)."""
    rows = []
    first = events.filter(F.col(type_col) == steps[0])
    rows.append(
        first.agg(
            F.lit(1).alias("depth"),
            F.lit(steps[0]).alias("step"),
            F.count(F.lit(1)).alias("n_chains"),
            F.countDistinct(on).alias("n_keys"),
        )
    )
    for depth in range(2, len(steps) + 1):
        m = funnel_match(
            events, on, time_col, type_col, steps[:depth], within_seconds
        )
        rows.append(
            m.agg(
                F.lit(depth).alias("depth"),
                F.lit(steps[depth - 1]).alias("step"),
                F.count(F.lit(1)).alias("n_chains"),
                F.countDistinct(on).alias("n_keys"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
