"""Skew-aware joins: salting for hot keys (SURVEY §4 X2 beyond AQE).

AQE's skew-join split (enabled by the session, X2) handles skew
*within sort-merge joins* by splitting oversized partitions. Salting
is the complementary tool when one side is small enough to replicate:
explode the small side R ways, scatter the big side's hot keys across
R salted partitions, join on (key, salt). Use it when a single key's
rows exceed what one task should hold even after AQE splitting (the
classic null-key / celebrity-user problem), or on Spark builds /
join types AQE won't split (broadcast-ineligible shuffled hash).

Semantics: identical to the unsalted inner/left join — the salt is a
uniform partition of the probe side, and each probe row meets the
build side exactly once (its own salt replica).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Join ``big ⋈ small`` on column ``on`` with an R-way salt.

    ``big`` gets a uniform random-but-deterministic salt per row
    (hash of the full row's key + a spread column would do; we use
    ``pmod(hash(monotonically_increasing_id()), R)`` — purely a
    partitioning choice, invisible in the result). ``small`` is
    exploded ×R so every (key, salt) bucket finds its match. The
    shuffle key becomes (key, salt): a key carrying 1/Nth of the data
    now spreads over R tasks.
    """
    if how not in ("inner", "left"):
        # Only inner/left are semantics-preserving with the small side
        # exploded: a right/full/anti join would emit R salted copies
        # of each unmatched small-side row.
        raise ValueError(f"salted_join supports how in ('inner','left'), got {how!r}")
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets)).cast(
            "int"
        ),
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_big.join(salted_small, [on, "_salt"], how)
    return out.drop("_salt")


def diagnose_skew(
    df: DataFrame,
    key_cols: list[str],
    top: int = 20,
    hot_share: float = 0.01,
) -> DataFrame:
    """Join/agg pre-flight: the ``top`` heaviest key values with row
    counts, corpus share, and the strategy a planner would pick —
    (keys..., n_rows, share, strategy) where strategy is

    * ``salt``   — share ≥ ``hot_share``: one task would own ≥ that
      fraction of the shuffle; spread it (salted_join / AQE skew
      split / the as-of bucketing hatch for windows);
    * ``hash``   — below the threshold: an ordinary hash shuffle is
      fine.

    One map-side-combined count aggregate + a TakeOrdered head — the
    diagnosis never shuffles more than (distinct keys) rows and
    collects nothing. Run it on a sample for quick checks; counts
    scale linearly so shares are sample-stable."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = df.count()
    share = F.col("n_rows").cast("double") / F.lit(float(total))
    return (
        counts.select(
            *key_cols,
            "n_rows",
            share.alias("share"),
            F.when(share >= float(hot_share), F.lit("salt"))
            .otherwise(F.lit("hash"))
            .alias("strategy"),
        )
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top)
    )
