"""Engine-portable vector math over ``array<float>`` embedding columns.

Dot products feed similarity *comparisons* (thresholds, top-k ranks),
so they must be bit-identical across partitionings and engines — the
same problem ``functions/aggfns.py`` solves for aggregates, solved the
same way: per-element double products are floored onto a µ-grid and
summed as exact integers, then one IEEE divide restores the scale.
float→double widening, the double multiply, ``floor``, and the final
divide are each single IEEE ops with identical results in Spark and
DuckDB; the decimal sum is exact integer arithmetic.

Everything is Catalyst ``zip_with``/``aggregate`` higher-order
expressions over attributes — no UDFs, stays in codegen. (Per the
dedup_fuzzy module's measured cliffs: callers must pass materialized
attribute columns, and these expressions must not be nested inside
another lambda.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: µ-grid: 6 fractional digits, ample for unit-normed embedding sims.
GRID = 1_000_000.0
#: Accumulator: BIGINT, not DECIMAL — higher-order-function lambdas run
#: interpreted (outside codegen), and long adds are ~2.3× faster there
#: than decimal adds (measured 0.9 s vs 2.1 s over 40k pairs).
#: Range: |floor(x·y·1e6)| < 2^63/dims needs |x·y| ≲ 1.4e11 for
#: 1k-dim vectors — far beyond any real embedding; ANSI mode turns a
#: violation into an explicit overflow error, not silent wrap.
_ACC = "long"


def grid_dot(a: Column, b: Column) -> Column:
    """Order/engine-exact dot product of two float-array columns."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(GRID)).cast(
            _ACC
        ),
    )
    return (
        F.aggregate(prods, F.lit(0).cast(_ACC), lambda acc, v: acc + v).cast("double")
        / F.lit(GRID)
    )


def grid_cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a grid dot product and *precomputed* grid norms
    (compute norms once per row, not once per pair)."""
    return grid_dot(a, b) / (F.sqrt(norm_a) * F.sqrt(norm_b))


def grid_dot_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`grid_dot` (same grid, same ops)."""
    return (
        f"(CAST(list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> CAST(FLOOR(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)"
        f" * {GRID}) AS BIGINT))) AS DOUBLE) / {GRID})"
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact BIGINT dot product of two integer-array columns (SQ8
    codes) — the ADC fast path for quantized serving: no per-element
    double multiply, no floor, no reconstructed float array. Order-
    and engine-exact by construction (integer adds are associative).
    Range: int8×int8 products are ≤ 127² = 16 129, so overflow needs
    > 2^63/16 129 ≈ 5.7e14 dims — unreachable. Same HOF staging
    discipline as :func:`grid_dot`: pass materialized attributes."""
    prods = F.zip_with(a, b, lambda x, y: x.cast(_ACC) * y.cast(_ACC))
    return F.aggregate(prods, F.lit(0).cast(_ACC), lambda acc, v: acc + v)


def int_dot_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`int_dot` (exact integer arithmetic on
    both engines — no tolerance needed)."""
    return (
        f"list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> CAST({a}[i] AS BIGINT) * CAST({b}[i] AS BIGINT)))"
    )


def grid_cosine_sql(a: str, b: str) -> str:
    """DuckDB twin of pairwise cosine (inline norms — fine for oracle
    scale; the Spark side precomputes norms per row instead)."""
    return (
        f"({grid_dot_sql(a, b)}"
        f" / (sqrt({grid_dot_sql(a, a)}) * sqrt({grid_dot_sql(b, b)})))"
    )


def rademacher_project(emb: Column, dim_in: int, dim_out: int) -> Column:
    """Johnson-Lindenstrauss random projection onto ``dim_out``
    deterministic Rademacher (±1) directions — the cheap
    dimensionality reduction for 100 TB embedding pipelines (shrink
    vectors BEFORE the expensive ANN/dedup passes; pairwise geometry
    survives to within the JL distortion bound).

    The planes are the same seeded md5 ±1 construction the sign-LSH
    family uses (plans/similarity.py::_plane_sign with table id
    ``jl``): plane p's i-th component is +1 iff the first hex digit
    of md5("jl:p:i") is odd — reproducible in any engine, no
    randomness at run time. Each output component is an exact grid
    dot (floor onto the µ-grid, BIGINT sum, one final divide), scaled
    by 1/√dim_out per the JL normalization — so projections are
    bit-identical across partitionings and engines.

    Pure codegen column math over a materialized attribute (HOF
    staging discipline applies — pass an attribute, not an
    expression).

    Length discipline: an embedding whose length differs from
    ``dim_in`` (or a NULL embedding) RAISES at execution instead of
    silently emitting NULL components — ``zip_with`` pads the shorter
    array with nulls, which would poison every downstream ANN/dedup
    distance unnoticed. Filter bad rows explicitly upstream if they
    are expected.
    """
    import hashlib

    def sign(p: int, i: int) -> float:
        h = hashlib.md5(f"jl:{p}:{i}".encode()).hexdigest()[0]
        return 1.0 if int(h, 16) % 2 else -1.0

    import math

    scale = 1.0 / math.sqrt(dim_out)
    comps = []
    for p in range(dim_out):
        planes = F.array(*[F.lit(sign(p, i)) for i in range(dim_in)])
        terms = F.zip_with(
            emb,
            planes,
            lambda x, s: F.floor(
                s * x.cast("double") * F.lit(GRID)
            ).cast(_ACC),
        )
        dot = (
            F.aggregate(terms, F.lit(0).cast(_ACC), lambda a, v: a + v).cast(
                "double"
            )
            / F.lit(GRID)
        )
        comps.append(dot * F.lit(scale))
    return F.when(F.size(emb) == F.lit(dim_in), F.array(*comps)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("rademacher_project: embedding length "),
                F.coalesce(F.size(emb).cast("string"), F.lit("NULL")),
                F.lit(f" != dim_in {dim_in}"),
            )
        )
    )


def l2_normalize(emb: Column, norm: Column | None = None) -> Column:
    """Unit-norm an embedding (array<double> out): each component
    divided by the grid-exact norm — the prerequisite for cosine-as-
    dot-product serving and for quantization tiers that assume unit
    vectors. The norm comes from :func:`grid_dot`'s exact integer
    sum, so normalized vectors are bit-identical across engines and
    partitionings; a zero vector normalizes to NULL components rather
    than ±Inf (guard, don't poison).

    HOF-NESTING COST (module header discipline): with ``norm`` omitted
    the aggregate norm expression sits INSIDE the transform lambda and
    re-evaluates per component — O(d²) interpreted work per row. Fine
    ad hoc at small d; at operator scale pass a STAGED norm attribute
    or use :func:`normalize_embeddings`, which stages it for you."""
    n = F.sqrt(grid_dot(emb, emb)) if norm is None else norm
    return F.transform(
        emb, lambda x: F.when(n > 0, x.cast("double") / n)
    )


def truncate_renorm(emb: Column, dims: int, norm: Column | None = None) -> Column:
    """Matryoshka-style truncation: keep the first ``dims`` components
    and re-normalize — the storage/serving trade MRL-trained
    embeddings support (half the dims ≈ most of the recall at half
    the bytes). Slice first, THEN normalize (the truncated prefix has
    its own norm; ``norm``, when staged, must be the PREFIX norm).
    Same staged-norm advice as :func:`l2_normalize`."""
    if dims <= 0:
        raise ValueError("dims must be positive")
    return l2_normalize(F.slice(emb, 1, int(dims)), norm=norm)


def normalize_embeddings(df, col: str, out: str | None = None, dims: int | None = None):
    """Operator-scale normalization: stages the (optionally truncated)
    prefix norm as an attribute column FIRST, so the transform lambda
    divides by a bound reference instead of re-evaluating the O(d)
    aggregate per component (the dedup_fuzzy codegen-cliff
    discipline). ``dims`` truncates-then-renorms; ``out`` defaults to
    replacing ``col``."""
    if dims is not None and dims <= 0:
        raise ValueError("dims must be positive")
    out = out or col
    e = F.slice(F.col(col), 1, int(dims)) if dims else F.col(col)
    staged = df.withColumn("_l2n", F.sqrt(grid_dot(e, e)))
    res = staged.withColumn(
        out,
        F.transform(
            e, lambda x: F.when(F.col("_l2n") > 0, x.cast("double") / F.col("_l2n"))
        ),
    )
    return res.drop("_l2n")
