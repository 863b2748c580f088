"""Line-level boilerplate removal — corpus-frequency line dedup
(§2.12 LLM-pipeline extension; the CCNet/RefinedWeb curation stage).

Document-level dedup keeps one copy of a duplicated PAGE; it cannot
touch the navigation bars, cookie banners, and footer chrome that
repeat across MILLIONS of otherwise-distinct pages. The standard fix
operates a level down: hash every line, count how many distinct
documents each line appears in, and strip lines whose document
frequency crosses a threshold — the text equivalent of a stopword
cut, applied before tokenization-stage signals so repeated chrome
stops polluting quality scores and fingerprints.

Scale shape: one split+posexplode (row-local), one
map-side-combined (line-hash → doc frequency) aggregate whose shuffle
carries distinct lines (not occurrences), one keyed join of
occurrences against the boilerplate hash set, and one per-document
reassembly aggregate (``array_sort(collect_list(struct(line_no,
line)))`` — bounded by document size, the packing-module bound
argument). Nothing driver-sized anywhere; the frequency table is the
only intermediate worth persisting when the same corpus feeds
several thresholds.

Line identity is the md5 of the whitespace-trimmed line — the same
hash-domain discipline as every dedup family here (exact content
keying, engine-replayable). Lines shorter than ``min_line_chars``
after trimming are EXEMPT: empty lines and "1." list markers repeat
everywhere without being boilerplate, and stripping them would
destroy structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_doc_frequency(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_line_chars: int = 10,
) -> DataFrame:
    """Corpus line-frequency table: (line_hash, n_docs, sample_line)
    over trimmed lines of at least ``min_line_chars`` chars — the
    reusable artifact thresholds are applied to. ``sample_line``
    (deterministic min) makes the table auditable by humans."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep))).alias(
            "line_no", "line"
        ),
    ).withColumn("_t", F.regexp_replace("line", r"^\s+|\s+$", ""))
    eligible = lines.filter(F.length("_t") >= int(min_line_chars))
    return (
        eligible.select(id_col, F.md5("_t").alias("line_hash"), "_t")
        .groupBy("line_hash")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.min("_t").alias("sample_line"),
        )
    )


def drop_boilerplate_lines(
    docs: DataFrame,
    max_doc_frequency: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_line_chars: int = 10,
) -> DataFrame:
    """Strip lines appearing in MORE than ``max_doc_frequency``
    distinct documents; returns (id, text, n_lines_kept,
    n_lines_dropped) with surviving lines rejoined by ``sep`` in
    their original order. Documents whose every line is boilerplate
    come back with empty text (downstream length gates — the curation
    composition's first filter — then drop them); short/empty lines
    are structure, never boilerplate (see module docstring)."""
    if max_doc_frequency < 1:
        raise ValueError("max_doc_frequency must be >= 1")
    freq = line_doc_frequency(
        docs, id_col, text_col, sep=sep, min_line_chars=min_line_chars
    )
    boiler = freq.filter(F.col("n_docs") > int(max_doc_frequency)).select(
        "line_hash"
    )
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep))).alias(
            "line_no", "line"
        ),
    ).withColumn("_t", F.regexp_replace("line", r"^\s+|\s+$", ""))
    tagged = lines.withColumn(
        "_h",
        F.when(
            F.length("_t") >= int(min_line_chars), F.md5("_t")
        ),  # exempt lines carry NULL -> never match the boiler set
    )
    kept = tagged.join(
        boiler.withColumnRenamed("line_hash", "_h").withColumn(
            "_drop", F.lit(True)
        ),
        "_h",
        "left",
    )
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_drop").isNull(),
                            F.struct("line_no", "line"),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            sep,
        ).alias(text_col),
        F.sum(F.when(F.col("_drop").isNull(), 1).otherwise(0)).alias(
            "n_lines_kept"
        ),
        F.sum(F.when(F.col("_drop").isNotNull(), 1).otherwise(0)).alias(
            "n_lines_dropped"
        ),
    )
