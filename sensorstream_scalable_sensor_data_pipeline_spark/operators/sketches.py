"""Sketch-based statistics (§2.12 extension): HyperLogLog distinct
counts and a Count-Min frequency sketch.

Exact `distinct` / `groupBy.count` answers need a full shuffle of the
key space; at 100 TB the monitoring questions ("how many distinct
users today", "roughly how often does this token appear") don't need
exact answers — they need ONE bounded-memory pass. Both sketches are
mergeable, so Spark computes them with map-side partial aggregation
and a tiny final merge — no data-sized shuffle at all.

* ``approx_distinct_counts``: per-column HyperLogLog++
  (``approx_count_distinct``) in ONE aggregate pass, relative error
  ``rsd`` (default 5 %). The exact twin is the oracle in tests —
  estimates must land within the advertised error.
* ``CountMinSketch`` / ``token_count_min_sketch``: the classic d×w
  counter matrix built as a DataFrame aggregation (PySpark does not
  expose the JVM ``stat.countMinSketch``, and building it as plain
  column math keeps it engine-portable anyway): each token lands in
  one bucket per row via an md5-derived hash — the SAME salted-md5
  identity the sampling/MinHash families use, so the driver-side
  probe replays the bucket arithmetic with ``hashlib`` exactly.
  Plan shape: explode tokens → d (row, bucket) keys per token →
  ONE map-side-combined count aggregate → d·w counters to the
  driver (w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉ — a few thousand ints, the
  sketch itself). Point estimates have the standard one-sided
  guarantee: never under the true count, over by ≤ ε·N with
  probability 1−δ (property-pinned in tests).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_counts(
    df: DataFrame, cols: list[str], rsd: float = 0.05
) -> DataFrame:
    """Long-form (column, approx_distinct) for every requested column,
    one HLL++ aggregate pass."""
    if not cols:
        raise ValueError("at least one column required")
    one = df.agg(
        *[
            F.approx_count_distinct(c, rsd=rsd).alias(f"{c}__ad")
            for c in cols
        ]
    )
    stack_args = ", ".join(f"'{c}', `{c}__ad`" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (`column`, approx_distinct)"
    )


def _cms_bucket_py(k: int, value: str, width: int) -> int:
    """Driver twin of the executor-side bucket expression."""
    return int(hashlib.md5(f"{k}:{value}".encode()).hexdigest()[:8], 16) % width


class CountMinSketch:
    """Driver-held counter matrix with the usual point-query API."""

    def __init__(self, counters: dict, width: int, depth: int, n_items: int):
        self._c = counters
        self.width = width
        self.depth = depth
        self.n_items = n_items

    def estimate(self, value: str) -> int:
        """Never below the true frequency; above by ≤ ε·N w.h.p."""
        return min(
            self._c.get((k, _cms_bucket_py(k, value, self.width)), 0)
            for k in range(self.depth)
        )


def count_min_sketch(
    items: DataFrame,
    col: str,
    eps: float = 0.001,
    delta: float = 0.01,
) -> CountMinSketch:
    """Build a Count-Min sketch over a string column in one pass."""
    width = max(2, math.ceil(math.e / eps))
    depth = max(1, math.ceil(math.log(1.0 / delta)))
    rows = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{k}:"), F.col(col))), 1, 8
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.lit(width)
                ).alias("b"),
            )
            for k in range(depth)
        ]
    )
    staged = items.select(F.col(col)).withColumn("_r", rows)
    keyed = staged.select(F.explode("_r").alias("rb")).select("rb.k", "rb.b")
    counted = keyed.groupBy("k", "b").agg(F.count(F.lit(1)).alias("n")).collect()
    counters = {(r["k"], r["b"]): r["n"] for r in counted}
    n_items = sum(r["n"] for r in counted) // max(1, depth)
    return CountMinSketch(counters, width, depth, n_items)


def token_count_min_sketch(
    docs: DataFrame,
    text_col: str = "text",
    eps: float = 0.001,
    delta: float = 0.01,
) -> CountMinSketch:
    """Count-Min over the corpus token stream (tokenize → explode →
    one sketch aggregate)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.text import (
        tokenize_lower,
    )

    toks = docs.select(tokenize_lower(F.col(text_col)).alias("_tk")).select(
        F.explode("_tk").alias("token")
    )
    return count_min_sketch(toks, "token", eps, delta)
