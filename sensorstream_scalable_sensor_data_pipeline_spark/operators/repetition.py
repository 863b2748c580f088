"""Within-document repetition signals (§2.12 extension) — the
Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
Models", Appendix A) every web-scale corpus pipeline runs alongside
the length/stopword gates in ``operators/text.py``: boilerplate and
spam repeat themselves, and the strongest cheap tell is the fraction
of a document that is duplicated lines or one dominating n-gram.

Signals per document:

* ``dup_line_frac`` — fraction of lines that are repeats of another
  line in the same document (1 − distinct/total);
* ``dup_line_char_frac`` — fraction of line characters living in
  lines that occur more than once (the Gopher "fraction of characters
  in duplicate lines");
* ``top_ngram_frac`` — fraction of token n-grams taken by the single
  most frequent n-gram (n=2 by default; Gopher's "top n-gram
  fraction").

Shape: everything is exploded-then-keyed — explode lines / n-grams,
one map-side-combined count per (doc, item), one per-doc aggregate,
then a keyed join of the two tiny per-doc stat frames. No window over
raw text, no UDF, no driver materialization; every shuffle keys on
``id_col`` (+item), so the pass scales like any token count. Ratios
are single IEEE divides of exact BIGINT counts — engine-replayable,
so the whole frame is DuckDB-oracle-checkable (tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.text import (
    tokenize_lower,
)


def token_ngrams(toks: F.Column, n: int) -> F.Column:
    """Space-joined token n-grams as an array column (empty when the
    document has fewer than ``n`` tokens). ``slice`` under a single
    ``transform`` — one HOF level, inside codegen."""
    if n < 1:
        raise ValueError("n must be >= 1")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 2,
) -> DataFrame:
    """Per-document repetition profile:
    ``(id, n_lines, dup_line_frac, dup_line_char_frac, n_ngrams,
    top_ngram_frac)``. Documents with fewer than ``ngram_n`` tokens
    carry NULL n-gram stats (nothing to measure, distinguishable from
    a genuine 0)."""
    d = docs.select(
        F.col(id_col),
        F.split(F.col(text_col), "\n").alias("_lines"),
        tokenize_lower(F.col(text_col)).alias("_tk"),
    )

    per_line = (
        d.select(F.col(id_col), F.explode("_lines").alias("line"))
        .groupBy(id_col, "line")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    chars = F.col("cnt") * F.length("line")
    line_stats = per_line.groupBy(id_col).agg(
        F.sum("cnt").alias("n_lines"),
        (
            F.lit(1.0)
            - F.count(F.lit(1)).cast("double") / F.sum("cnt").cast("double")
        ).alias("dup_line_frac"),
        (
            F.sum(F.when(F.col("cnt") > 1, chars).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.nullif(F.sum(chars), F.lit(0).cast("long")).cast("double")
        ).alias("dup_line_char_frac"),
    )

    per_gram = (
        d.select(
            F.col(id_col),
            F.explode(token_ngrams(F.col("_tk"), ngram_n)).alias("g"),
        )
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    gram_stats = per_gram.groupBy(id_col).agg(
        F.sum("cnt").alias("n_ngrams"),
        (
            F.max("cnt").cast("double") / F.sum("cnt").cast("double")
        ).alias("top_ngram_frac"),
    )

    return line_stats.join(gram_stats, id_col, "left")
