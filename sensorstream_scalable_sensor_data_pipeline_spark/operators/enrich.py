"""Dimension enrichment joins (J1, J3 in SURVEY §2.3).

The reference's only Spark join is a broadcast left-outer fact×dim
enrichment: ``df.join(broadcast(tags_df), df.tagid == tags_df.id,
"left")`` (main_pipeline.py:196). Its second join is implicit: regex-
matched tag ids are collected to the driver and injected as an
``IN (...)`` SQL string (main_pipeline.py:296-298, 343-350) — a
hand-rolled semi-join. Both re-expressed declaratively:

* ``enrich`` — broadcast hash join; zero shuffle of the fact side.
  At 100 TB the fact side never moves; only the dim (≤ MBs) ships to
  executors once.
* ``semi_filter`` — broadcast LEFT SEMI join; replaces collect+IN so
  no ids ever hit the driver and the match set can itself be a
  distributed relation of any size (Catalyst/AQE picks broadcast vs
  shuffled semi automatically when we don't hint; we hint broadcast
  because dimension match-sets are small by construction here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1: fact×dim enrichment join, dim broadcast by default."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on, how)


def semi_filter(
    fact: DataFrame,
    keys: DataFrame,
    on: Column | str | list[str],
    broadcast_keys: bool = True,
) -> DataFrame:
    """J3: keep fact rows whose key appears in ``keys`` (left semi).

    The distributed form of the reference's collect-ids-into-IN-list
    (P7/J3): semantics identical, but the key set never leaves the
    executors.
    """
    k = F.broadcast(keys) if broadcast_keys else keys
    return fact.join(k, on, "left_semi")


def anti_filter(
    fact: DataFrame,
    keys: DataFrame,
    on: Column | str | list[str],
    broadcast_keys: bool = True,
) -> DataFrame:
    """NOT-IN companion of ``semi_filter`` (left anti) — needed by the
    incremental merge path (new-rows-not-yet-materialized)."""
    k = F.broadcast(keys) if broadcast_keys else keys
    return fact.join(k, on, "left_anti")
