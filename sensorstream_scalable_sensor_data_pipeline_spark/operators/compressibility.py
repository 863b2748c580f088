"""Compression-ratio quality signal (§2.12 extension).

The cheapest structure detector there is: zlib-compress each
document and report ``compressed_bytes / raw_bytes``. Boilerplate,
template spam, and keyword-stuffed pages compress far better than
natural prose (their entropy is lower), so very LOW ratios flag junk
— a standard pre-training heuristic alongside the Gopher gates and
the unigram-LM score, catching a different failure mode than either
(a page of one repeated sentence passes stopword/length gates and
scores WELL under a unigram LM; its ~0.05 ratio gives it away).

This is the one text operator that genuinely cannot be a Catalyst
expression (no built-in DEFLATE), so it takes the sanctioned slow
path: Arrow-batched ``mapInPandas`` — whole record batches cross to
the Python worker once, zlib runs at C speed per document, and the
output schema stays flat/columnar. No shuffle; scan-speed bounded by
the codec (~100 MB/s/core). Deterministic for a fixed zlib level, so
results are run-stable and split-safe — but NOT oracle-checkable in
DuckDB (no zlib there); tests pin the discriminative property
instead: repeated-boilerplate text scores far below natural text.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed compression level: determinism beats speed here (level 6 is
#: zlib's default tradeoff; changing it changes every score).
ZLIB_LEVEL = 6


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, raw_bytes, compressed_bytes, compression_ratio) per
    document; empty documents yield ratio NULL rather than a
    divide-by-zero."""
    out_schema = (
        f"{id_col} long, raw_bytes long, compressed_bytes long, "
        "compression_ratio double"
    )

    def run(batches: Iterator) -> Iterator:
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = pdf[text_col].fillna("").map(lambda s: s.encode("utf-8"))
            raw_n = raw.map(len)
            comp_n = raw.map(lambda b: len(zlib.compress(b, ZLIB_LEVEL)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_bytes": raw_n.astype("int64"),
                    "compressed_bytes": comp_n.astype("int64"),
                    "compression_ratio": [
                        (c / r) if r > 0 else None
                        for c, r in zip(comp_n, raw_n)
                    ],
                }
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, out_schema)
