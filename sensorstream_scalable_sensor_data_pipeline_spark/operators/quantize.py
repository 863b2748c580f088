"""Int8 scalar quantization for embedding columns (§2.12 extension).

At 100 TB an `array<float>` embedding column is usually the widest
thing in the table — 4 bytes/dim before compression. Vector stores
(FAISS SQ8, Milvus, pgvector halfvec/int8) ship scalar quantization
for exactly this: per-vector max-abs scale + int8 codes = 4×
smaller scans, with recall loss small enough that SQ8 is the default
serving tier. The engine expresses it as pure Catalyst array math —
no UDFs, stays in codegen, columns prune like any other:

* ``quantize_embedding``: scale = max|x|/127 (one array pass),
  code_i = round(x_i/scale) ∈ [−127, 127] (second pass). Zero and
  constant-zero vectors get scale 0 and all-zero codes.
* ``dequantize_embedding``: x̂_i = code_i·scale — reconstruction
  error ≤ scale/2 per component (≤ max|x|/254).

Quantize/dequantize round-trips deterministically in DuckDB (the
oracle replays round-half-up + division exactly), so the op is
locally oracle-checked like the rest of the vector family. ANN
integration: quantized corpora reuse the same IVF layout — lists
store (code, scale) instead of floats; score with
``grid_dot(dequantize(...), q)`` or an integer dot + one final
rescale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: int8 symmetric range.
_QMAX = 127


def quantize_embedding(emb: Column) -> tuple[Column, Column]:
    """Return ``(codes, scale)`` columns for a float-array column:
    ``codes`` is ``array<tinyint>`` (symmetric, round-half-up away
    from zero via ``round``), ``scale`` the per-vector float step.
    Must be given a materialized attribute (HOF staging discipline —
    see operators/dedup_fuzzy.py docstring)."""
    absmax = F.aggregate(
        F.transform(emb, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    )
    scale = (absmax / F.lit(float(_QMAX))).alias("scale")
    codes = F.when(
        absmax == 0.0,
        F.transform(emb, lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            emb,
            lambda x: F.round(x.cast("double") * F.lit(float(_QMAX)) / absmax)
            .cast("int")
            .cast("tinyint"),
        )
    )
    return codes, scale


def dequantize_embedding(codes: Column, scale: Column) -> Column:
    """Reconstruct an ``array<float>`` from codes + per-vector scale."""
    return F.transform(
        codes, lambda c: (c.cast("double") * scale).cast("float")
    )


def quantize_table(
    emb: DataFrame, id_col: str, emb_col: str = "embedding"
) -> DataFrame:
    """(id, codes, scale) — the storage form of an embedding table:
    4× narrower scans for every downstream ANN/dedup pass that
    tolerates SQ8 precision."""
    codes, scale = quantize_embedding(F.col(emb_col))
    return emb.select(
        F.col(id_col), codes.alias("codes"), scale.alias("scale")
    )
