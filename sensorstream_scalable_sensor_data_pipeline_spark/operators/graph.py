"""Iterative graph computation: PageRank over an edge table
(§2.12 — the iterative-algorithm shape, beyond the transitive
closure the dedup family already runs).

Entity graphs fall out of every pipeline here — near-dup links,
user→domain interactions, sensor adjacency — and "which nodes
matter" is the first question asked of them. PageRank is the
canonical answer and the canonical ITERATIVE Spark workload: each
round is one keyed join (ranks → out-edges) + one aggregate
(contributions by target), with the same lineage discipline as
``dup_components`` — an eager ``localCheckpoint`` per round, or the
self-referential plan nests exponentially and re-executes every
prior round inside each new one.

Determinism doctrine: contribution sums are GRID sums
(functions/aggfns.py) — a plain double SUM is partition-order
dependent, and after 20 iterations the ulp drift becomes visible
rank churn between runs. With grid sums every round is bit-stable
under any partitioning, and the whole fixed-iteration computation is
replayable by a numpy oracle addend-for-addend (pinned in tests).

Dangling nodes (no out-edges) leak mass; the standard fix
redistributes their rank uniformly each round — one scalar aggregate
(the dangling mass) to the driver per round, nothing data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.functions.aggfns import dsum

DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    iters: int = 20,
    damping: float = DAMPING,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank: (node, rank) over the directed edge
    table, ranks summing to ~1. Duplicate edges count once (the
    standard simple-graph convention; pre-aggregate weights upstream
    if multiplicity should matter). ``iters`` is the convergence
    knob — 20 rounds lands within ~1e-6 of the fixpoint on
    small-diameter graphs."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("empty edge table: nothing to rank")
    # frozen like `out` — the per-round dangling job would otherwise
    # re-execute the distinct+aggregate lineage every iteration
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    # out-edges with degree attached, frozen once — every round joins
    # against this same materialized table
    out = (
        e.join(deg, "src")
        .select("src", "dst", "deg")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    for _ in range(iters):
        # dangling mass: ranks of nodes with no out-edges (one scalar)
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(dsum("rank").alias("m"))
            .collect()[0]["m"]
        )
        dangling = float(dangling or 0.0)
        contribs = (
            ranks.join(out, ranks["node"] == out["src"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(dsum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
    strict: bool = True,
    driver_max_pairs: int | None = None,
) -> DataFrame:
    """General connected components over an undirected edge table:
    (node, component) with ``component`` = the min node id of the
    component — the dedup family's transitive-closure machinery
    (dedup_fuzzy.py::dup_components: size-aware driver union-find
    under the bounded-pairs threshold, min-label-propagation keyed
    joins above it) exposed for arbitrary graphs. ``strict`` defaults
    True here: a general caller has no safe under-merge direction, so
    non-convergence raises rather than warns."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_fuzzy import (
        DRIVER_UNION_FIND_MAX_PAIRS,
        dup_components,
    )

    pairs = edges.select(F.col(src).alias("id_a"), F.col(dst).alias("id_b"))
    comp = dup_components(
        pairs,
        max_iters=max_iters,
        strict=strict,
        driver_max_pairs=(
            DRIVER_UNION_FIND_MAX_PAIRS
            if driver_max_pairs is None
            else driver_max_pairs
        ),
    )
    return comp.select(F.col("doc_id").alias("node"), F.col("rep").alias("component"))
