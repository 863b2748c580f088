"""Registry wiring query callables to their DuckDB oracle SQL.

Contract (driver's ``__spark_entry__.py``): every query is a
``(spark, sf_dir) -> DataFrame`` callable; its oracle is ANSI SQL over
the same parquet tables, producing the *same column names* (the
driver sorts columns by name and hashes values). Queries whose
semantics are not SQL-expressible (stateful streaming internals,
randomized ANN) register ``oracle=None`` → the driver performs a
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as query ``name`` with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def get(name: str) -> QuerySpec:
    return _REGISTRY[name]


def all_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}


# --- oracle SQL builders (mirror functions/aggfns.py exactly) ----------

SCALE = 1_000_000
ACC_T = "DECIMAL(30,0)"


def dsum_sql(expr: str) -> str:
    """DuckDB mirror of ``aggfns.dsum`` — µ-unit exact sum → double."""
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * {SCALE}.0) AS {ACC_T})) AS DOUBLE)"
        f" / {SCALE}.0)"
    )


def davg_sql(expr: str) -> str:
    """DuckDB mirror of ``aggfns.davg``."""
    return f"({dsum_sql(expr)} / COUNT({expr}))"
