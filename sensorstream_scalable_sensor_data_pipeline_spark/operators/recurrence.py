"""Distributed linear recurrences — EWMA (exponential smoothing) at
scale (§2.12 custom operators: a running recurrence y_i = α·x_i +
(1−α)·y_{i−1} is SEQUENTIAL, the one shape Spark's window functions
cannot express — `avg over rows between` is a different statistic,
and a naive per-key loop doesn't distribute).

The decomposition is the module family's standard two-level split
(`asof_join_bucketed`, `resample_locf`): a first-order linear
recurrence composed over any row range is itself linear in the
incoming state — a chunk of rows reduces to ``y_end = A + B·carry``
with ``A`` the fold from zero state and ``B = (1−α)^len`` — so:

1. *Within-chunk pass* (embarrassingly parallel): per (key, chunk of
   ``chunk_rows`` ordered rows), one Catalyst ``aggregate`` fold
   computes the running constant terms ``A_i`` for every row and the
   chunk summary ``(A_end, B)``. Executor-local, zero UDFs; the fold
   appends to an array accumulator, so in-chunk work is O(len²)
   element copies — bounded by ``chunk_rows`` (the knob), ~512² ≈
   260k double copies per chunk, microseconds.
2. *Carry pass*: per key, the chunk summaries (rows/chunk_rows of
   them — the collected array is the documented per-key bound; raise
   ``chunk_rows`` for pathologically hot keys) fold into the carry
   chain ``c_{k+1} = A_k + B_k·c_k``.
3. *Stitch*: ``y_i = A_i + (1−α)^{pos+1} · c_chunk`` per row.

Initialization folds in for free: pandas' ``ewm(adjust=False)`` sets
``y_0 = x_0``, and ``x_0 = α·x_0 + (1−α)·x_0`` — i.e. the standard
recurrence with ``carry_0 = x_0`` — so the key's first value IS the
initial carry and every row follows one uniform rule.

NUMERICS, stated honestly: the chunk-boundary linear form reorders
floating-point operations relative to the strict sequential fold, so
results match pandas to ~machine epsilon per boundary (tests pin
``rtol 1e-9``), NOT bit-exactly — unlike the grid-exact aggregates
elsewhere in this repo, which is why this module does not ship a
hash-level oracle. Chunk-size invariance is pinned the same way.

SKEW: the row_number window partitions by the bare key (a recurrence
cannot be split by value, only by position), so one task orders one
key's rows — the same funnel note as `operators/asof.py`; the heavy
per-row WORK here is already chunk-parallel, which is the part that
matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma(
    df: DataFrame,
    on: str,
    time_col: str,
    value_col: str,
    alpha: float,
    chunk_rows: int = 512,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average in event-time
    order, ``pandas ewm(alpha, adjust=False)`` semantics (``y_0 =
    x_0``). Returns the input's (on, time_col, value_col) plus
    ``out_col``. Rows with NULL values are not supported (filter or
    fill first — a recurrence needs a defined input at every step)."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    if chunk_rows < 2:
        raise ValueError("chunk_rows must be at least 2")
    a, b = float(alpha), 1.0 - float(alpha)
    L = int(chunk_rows)

    w = Window.partitionBy(on).orderBy(time_col)
    rows = df.select(
        F.col(on),
        F.col(time_col),
        F.col(value_col).cast("double").alias("_x"),
        (F.row_number().over(w) - 1).alias("_rn"),
        F.first(value_col).over(w).cast("double").alias("_x0"),
    ).select(
        "*",
        (F.col("_rn") / L).cast("long").alias("_ck"),
        (F.col("_rn") % L).alias("_pos"),
    )

    # 1) within-chunk fold: running constant terms A_i (zero incoming
    # state) + the chunk summary (A_end, B = (1-a)^len)
    chunks = rows.groupBy(on, "_ck").agg(
        F.array_sort(
            F.collect_list(F.struct("_pos", time_col, "_x"))
        ).alias("_items"),
        F.min("_x0").alias("_x0"),
    )
    fold = F.expr(
        f"""aggregate(
              _items,
              struct(cast(array() as array<double>) as arr,
                     cast(0.0 as double) as last),
              (acc, it) -> struct(
                  concat(acc.arr, array({a}d * it._x + {b}d * acc.last)),
                  {a}d * it._x + {b}d * acc.last)
            )"""
    )
    chunks = chunks.select(
        on, "_ck", "_items", "_x0",
        fold.getField("arr").alias("_A"),
        F.pow(F.lit(b), F.size("_items")).alias("_B"),
    ).select(
        "*", F.element_at("_A", F.size("_A")).alias("_A_end")
    )

    # 2) carry chain per key: c_0 = x_0 (the init-folds-in trick),
    # c_{k+1} = A_k + B_k * c_k; carries[k] = incoming state of chunk k
    summaries = chunks.groupBy(on).agg(
        F.array_sort(
            F.collect_list(F.struct("_ck", "_A_end", "_B"))
        ).alias("_sum"),
        F.min("_x0").alias("_x0"),
    )
    carry_fold = F.expr(
        """aggregate(
             _sum,
             struct(cast(array() as array<double>) as arr,
                    cast(_x0 as double) as last),
             (acc, s) -> struct(
                 concat(acc.arr, array(acc.last)),
                 s._A_end + s._B * acc.last)
           )"""
    )
    carries = summaries.select(
        on, carry_fold.getField("arr").alias("_carries")
    )

    # 3) stitch: y_i = A_i + (1-a)^(pos+1) * carry(chunk)
    out = (
        chunks.join(carries, on)
        .select(
            on,
            F.element_at("_carries", F.col("_ck").cast("int") + 1).alias(
                "_c"
            ),
            F.arrays_zip("_items", "_A").alias("_z"),
        )
        .select(on, "_c", F.explode("_z").alias("_e"))
    )
    return out.select(
        F.col(on),
        F.col(f"_e._items.{time_col}").alias(time_col),
        F.col("_e._items._x").alias(value_col),
        (
            F.col("_e._A")
            + F.pow(F.lit(b), F.col("_e._items._pos") + 1) * F.col("_c")
        ).alias(out_col),
    )


def ewma_irregular(
    df: DataFrame,
    on: str,
    time_col: str,
    value_col: str,
    halflife_seconds: float,
    chunk_rows: int = 512,
    out_col: str = "ewma",
) -> DataFrame:
    """EWMA for IRREGULARLY-sampled series — the form sensor data
    actually needs: the decay between consecutive readings is
    ``d_i = exp(−ln2 · Δt_i / halflife)`` so a reading twice as far
    back weighs exponentially less *in time*, not in row count:
    ``y_i = (1−d_i)·x_i + d_i·y_{i−1}``, ``y_0 = x_0``. A constant
    sampling interval Δt reduces this exactly to :func:`ewma` with
    ``α = 1 − exp(−ln2·Δt/halflife)``.

    Same decomposition as :func:`ewma` — per-row decay changes
    nothing structural, because a first-order recurrence with ANY
    per-step coefficients is still linear in the incoming state:
    the chunk summary becomes ``(A_end, B = ∏ d_i)``, and the per-row
    stitch multiplier is the RUNNING decay product (folded alongside
    ``A_i``). Zero UDFs; the oracle is a sequential numpy replay
    (tests), float-tolerance like :func:`ewma`."""
    if halflife_seconds <= 0:
        raise ValueError("halflife_seconds must be positive")
    if chunk_rows < 2:
        raise ValueError("chunk_rows must be at least 2")
    L = int(chunk_rows)
    # ln 2 / halflife, in 1/µs — decay exponent per event-time µs
    import math

    lam = math.log(2.0) / (float(halflife_seconds) * 1_000_000.0)

    w = Window.partitionBy(on).orderBy(time_col)
    rows = df.select(
        F.col(on),
        F.unix_micros(F.col(time_col)).alias("_tus"),
        F.col(time_col),
        F.col(value_col).cast("double").alias("_x"),
        (F.row_number().over(w) - 1).alias("_rn"),
        F.first(value_col).over(w).cast("double").alias("_x0"),
        F.lag(F.unix_micros(F.col(time_col))).over(w).alias("_prev_tus"),
    ).select(
        "*",
        # d_i = exp(-λ·Δt); the key's FIRST row keeps d from its
        # virtual carry: any d works there since carry_0 = x_0 is a
        # fixed point — use d=1-α-style exp(0)=1? No: y_0 must equal
        # x_0 = (1-d)x_0 + d·x_0 for EVERY d, so d_0 is arbitrary;
        # pick 1.0 (pure carry) for chunk algebra simplicity.
        F.when(
            F.col("_prev_tus").isNull(), F.lit(1.0)
        )
        .otherwise(
            F.exp(-F.lit(lam) * (F.col("_tus") - F.col("_prev_tus")))
        )
        .alias("_d"),
        (F.col("_rn") / L).cast("long").alias("_ck"),
        (F.col("_rn") % L).alias("_pos"),
    )

    chunks = rows.groupBy(on, "_ck").agg(
        F.array_sort(
            F.collect_list(F.struct("_pos", time_col, "_x", "_d"))
        ).alias("_items"),
        F.min("_x0").alias("_x0"),
    )
    # fold: A_i running constant term, P_i running decay product
    fold = F.expr(
        """aggregate(
             _items,
             struct(cast(array() as array<double>) as arr,
                    cast(array() as array<double>) as prods,
                    cast(0.0 as double) as last,
                    cast(1.0 as double) as prod),
             (acc, it) -> struct(
                 concat(acc.arr,
                        array((1.0d - it._d) * it._x + it._d * acc.last)),
                 concat(acc.prods, array(acc.prod * it._d)),
                 (1.0d - it._d) * it._x + it._d * acc.last,
                 acc.prod * it._d)
           )"""
    )
    chunks = chunks.select(
        on, "_ck", "_items", "_x0",
        fold.getField("arr").alias("_A"),
        fold.getField("prods").alias("_P"),
        fold.getField("last").alias("_A_end"),
        fold.getField("prod").alias("_B"),
    )

    summaries = chunks.groupBy(on).agg(
        F.array_sort(
            F.collect_list(F.struct("_ck", "_A_end", "_B"))
        ).alias("_sum"),
        F.min("_x0").alias("_x0"),
    )
    carry_fold = F.expr(
        """aggregate(
             _sum,
             struct(cast(array() as array<double>) as arr,
                    cast(_x0 as double) as last),
             (acc, s) -> struct(
                 concat(acc.arr, array(acc.last)),
                 s._A_end + s._B * acc.last)
           )"""
    )
    carries = summaries.select(
        on, carry_fold.getField("arr").alias("_carries")
    )

    out = (
        chunks.join(carries, on)
        .select(
            on,
            F.element_at("_carries", F.col("_ck").cast("int") + 1).alias(
                "_c"
            ),
            F.arrays_zip("_items", "_A", "_P").alias("_z"),
        )
        .select(on, "_c", F.explode("_z").alias("_e"))
    )
    return out.select(
        F.col(on),
        F.col(f"_e._items.{time_col}").alias(time_col),
        F.col("_e._items._x").alias(value_col),
        (F.col("_e._A") + F.col("_e._P") * F.col("_c")).alias(out_col),
    )
