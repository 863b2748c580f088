"""Column profiling (§2.12 extension): the stats pass every
large-scale pipeline runs before and after each transformation —
null rates for schema drift, min/max for range sanity, exact
quantiles for distribution shift. The reference validates schemas
but never profiles values; a 100 TB pipeline alerts on these numbers
daily.

Shape: ONE aggregate pass computes every statistic for every
requested column (a single partial-aggregated job — no per-column
scans), producing a 1-row frame that is unpivoted driver-side-free
via ``stack`` into the long (column, stat) form dashboards ingest.

Exact quantiles (``percentile``) sort each column's values inside
the aggregate — fine into the billions of rows per executor, and
bit-comparable to DuckDB's ``quantile_cont`` (both linearly
interpolate between closest ranks, each interpolation a couple of
IEEE ops on exactly-sorted doubles). For corpora where even that
sort is too much, pass ``approx=True`` to switch to
``approx_percentile`` (t-digest, bounded memory) — the scale path,
no longer oracle-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Quantiles reported by default: quartiles + tails.
DEFAULT_QUANTILES = (0.05, 0.25, 0.5, 0.75, 0.95)


def profile_numeric(
    df: DataFrame,
    cols: list[str],
    quantiles: tuple[float, ...] = DEFAULT_QUANTILES,
    approx: bool = False,
) -> DataFrame:
    """Long-form numeric profile: one row per column with
    ``(column, n, n_null, min, max, q05..q95)``. All columns profiled
    in ONE aggregate pass."""
    if not cols:
        raise ValueError("at least one column required")
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [
            F.count(v).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__n_null"),
            F.min(v).alias(f"{c}__min"),
            F.max(v).alias(f"{c}__max"),
        ]
        for q in quantiles:
            fn = "approx_percentile" if approx else "percentile"
            aggs.append(
                F.expr(f"{fn}(CAST({c} AS DOUBLE), {q!r})").alias(
                    f"{c}__q{int(q * 100):02d}"
                )
            )
    one = df.agg(*aggs)
    stats = ["n", "n_null", "min", "max"] + [
        f"q{int(q * 100):02d}" for q in quantiles
    ]
    stack_args = ", ".join(
        "'{c}', {fields}".format(
            c=c,
            fields=", ".join(f"CAST(`{c}__{s}` AS DOUBLE)" for s in stats),
        )
        for c in cols
    )
    stat_cols = ", ".join(f"`{s}`" for s in stats)
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (`column`, {stat_cols})"
    )
