"""Cross-engine-stable numeric aggregation (oracle parity, SURVEY §7 risks).

Summing doubles is order-dependent: Spark's partial aggregation over N
partitions and DuckDB's sequential scan add the same values in
different orders and drift by ulps — enough to break an exact
value-hash comparison, and enough to make our own results vary
run-to-run under AQE replans. Two naive fixes fail:

* plain ROUND after the sum — the accumulated drift can exceed any
  rounding grid;
* CAST(x AS DECIMAL(p,s)) per addend — the double→decimal *rounding
  path itself* differs between engines (exact binary expansion
  HALF_UP in Spark vs shortest-representation rounding in DuckDB),
  observed as 1-ulp-per-few-thousand-rows drift at sf0.01.

What is bit-identical everywhere is IEEE double arithmetic and
``floor``. So we fix the aggregation *semantics* to a µ-unit grid:

    dsum(x) = double(SUM(decimal(floor(x * 1e6)))) / 1e6

``x * 1e6`` is one IEEE multiply (identical bits both engines);
``floor`` gives an integer-valued double ≤ 2^53 which converts to
DECIMAL *exactly* (no rounding rule involved); the decimal SUM is
exact integer arithmetic (order-insensitive); the final divide is one
IEEE op. Deterministic under any partitioning, any engine.

Cost: stays inside whole-stage codegen and map-side partial
aggregation; the scan still dominates at 100 TB. Semantics: addends
are truncated to 6 fractional digits — a *defined* engine semantic
(document per query); use plain ``F.sum`` where cross-engine
bit-stability isn't required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: µ-unit grid: 6 fractional digits.
SCALE = 1_000_000
#: Exact integer accumulator — DECIMAL(30,0) holds 1e12 rows of
#: 1e12-scaled addends without overflow.
ACC_T = "decimal(30,0)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Order- and engine-insensitive SUM over doubles (µ-unit grid)."""
    c = _c(col)
    return (
        F.sum(F.floor(c * F.lit(float(SCALE))).cast(ACC_T)).cast("double")
        / F.lit(float(SCALE))
    )


def davg(col: Column | str) -> Column:
    """Order- and engine-insensitive AVG over doubles (µ-unit grid)."""
    c = _c(col)
    return (
        F.sum(F.floor(c * F.lit(float(SCALE))).cast(ACC_T)).cast("double")
        / F.lit(float(SCALE))
        / F.count(c)
    )
