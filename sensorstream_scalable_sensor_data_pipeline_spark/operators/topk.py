"""Grouped top-k (engine extension; SURVEY §2.12, §4 note).

Not in the reference (it has no ranking windows at all — SURVEY §2.5),
but required by the similarity-search extension and generally by any
per-key leaderboard. Window + row_number + filter is the built-in
plan: one hash shuffle on the group key, per-partition sort. Catalyst
pushes the ``rn <= k`` filter into the window's sort as a group-limit
(WindowGroupLimit) so each partition keeps only k rows per key — this
survives 100× scale-up, unlike a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-k rows per group under a *deterministic* order —
    pass tie-breaking columns in ``order_by`` so results are stable
    across engines and runs."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
