"""Exact-substring (span-level) deduplication — the Lee et al. 2022
"Deduplicating Training Data Makes Language Models Better" tier.

Document-level dedup (exact / MinHash / SimHash / SemDeDup) drops
whole documents; real web corpora ALSO repeat long passages inside
otherwise-distinct documents (licenses, navigation chrome, quoted
boilerplate), and those survive every document-level pass. ExactSubstr
removes every occurrence of a duplicated token span EXCEPT one
canonical copy, at span granularity.

The reference paper builds a corpus-wide suffix array — a
single-machine construction that does not distribute. The Spark-first
equivalent fingerprints every ``span_tokens``-token window and works
at window granularity:

1. every document emits its windows as (doc, pos, md5-of-window) —
   O(total tokens) rows, built from STAGED token-array attributes
   (slice-in-transform, the dedup_fuzzy HOF discipline), case-folded
   for matching while reassembly keeps original tokens;
2. one keyed aggregate finds fingerprints occurring ≥
   ``min_occurrences`` times and picks the GLOBAL canonical
   occurrence = min (doc, pos) struct — deterministic under any
   partitioning;
3. non-canonical occurrences become per-document removal intervals
   [pos, pos+L), merged into maximal islands by an integer
   gaps-and-islands window (the operators/asof.py merge_intervals
   shape on positions instead of time);
4. reassembly filters each document's token array against its
   (bounded, token-count-sized) interval list and re-joins with
   single spaces — order preserved, nothing touches the driver.

A contiguous passage longer than one window removes/keeps COHERENTLY:
every window of the passage shares the same global minimum document,
so the earliest copy keeps the whole run and every other copy loses
it. Window granularity means the trailing < span_tokens tokens of a
duplicated passage (which form no complete window starting inside it
beyond the last full one) are covered by the run's overlapping
windows; fragments shorter than ``span_tokens`` never match — the
same resolution limit as the paper's minimum-match length.

Output text is whitespace-normalized (tokens re-joined with single
spaces) — the same contract as every text operator here; matching is
case-insensitive, reassembly preserves original token case.

Scale shape: window generation is scan-side array math; the only
shuffles are the fingerprint count (map-side combined), the
removal-interval window (keyed by doc), and one keyed join back —
no all-pairs anywhere. Skew: a boilerplate fingerprint occurring
millions of times lands on one reducer for the count; the aggregate
is a partial-combined count + min_by, both associative, so AQE skew
handling applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.text import tokenize

#: Default span length — the paper's 50-token minimum match, scaled to
#: the short synthetic documents these tests run on; callers tune it.
DEFAULT_SPAN_TOKENS = 20


def span_windows(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int,
) -> DataFrame:
    """(id, wpos, wfp): every ``span_tokens``-token window's position
    and case-folded md5 fingerprint. Documents shorter than the span
    emit no windows — they cannot contain a duplicated span of that
    length."""
    staged = docs.select(F.col(id_col), tokenize(F.col(text_col)).alias("_tk"))
    staged = staged.withColumn("_lk", F.transform(F.col("_tk"), F.lower))
    n = F.size("_lk")
    grams = F.transform(
        F.sequence(F.lit(0), n - span_tokens),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("_lk"), i + 1, span_tokens))),
    )
    return (
        staged.filter(n >= span_tokens)
        .select(id_col, F.posexplode(grams).alias("wpos", "wfp"))
    )


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = DEFAULT_SPAN_TOKENS,
    min_occurrences: int = 2,
) -> DataFrame:
    """Every occurrence of a duplicated ``span_tokens``-token span is
    removed except the global canonical copy (min (id, pos)). Returns
    the full corpus as (id_col, text_col, n_tokens, n_tokens_removed)
    — untouched documents pass through (normalized whitespace) with
    zero removed."""
    if span_tokens < 2:
        raise ValueError("span_tokens must be at least 2")
    if min_occurrences < 2:
        raise ValueError("min_occurrences must be at least 2")
    staged = docs.select(F.col(id_col), tokenize(F.col(text_col)).alias("_tk"))
    wins = span_windows(docs, id_col, text_col, span_tokens)
    dup = (
        wins.groupBy("wfp")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(F.struct(F.col(id_col), F.col("wpos"))).alias("_canon"),
        )
        .filter(F.col("_n") >= min_occurrences)
        .select("wfp", "_canon")
    )
    removals = wins.join(dup, "wfp").filter(
        ~(
            (F.col(id_col) == F.col(f"_canon.{id_col}"))
            & (F.col("wpos") == F.col("_canon.wpos"))
        )
    )
    # gaps-and-islands over integer positions: merge overlapping /
    # adjacent removal windows into maximal intervals per document
    w = Window.partitionBy(id_col).orderBy("wpos")
    prev_end = F.max(F.col("wpos") + span_tokens).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        removals.select(id_col, "wpos")
        .distinct()
        .withColumn(
            "_new",
            F.when(prev_end.isNull() | (F.col("wpos") > prev_end), 1).otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(w))
    )
    intervals = islands.groupBy(id_col, "_isl").agg(
        F.min("wpos").alias("_s"), (F.max("wpos") + span_tokens).alias("_e")
    )
    # bounded per-doc interval list: ≤ one entry per token position,
    # the same O(doc length) bound as the token array itself
    per_doc = intervals.groupBy(id_col).agg(
        F.collect_list(F.struct("_s", "_e")).alias("_iv")
    )
    joined = staged.join(per_doc, id_col, "left")
    # Reassemble by slicing the KEPT intervals (the complement of the
    # sorted removal islands) — O(doc length) array math. A membership
    # test per token (array_contains over covered positions) would be
    # O(n·covered): quadratic for a long, heavily-duplicated document,
    # exactly the doc this operator exists to clean. Each stage is a
    # materialized attribute (HOF staging discipline); zip_with pairs
    # island boundaries into gap spans.
    iv = F.coalesce(F.col("_iv"), F.array().cast("array<struct<_s:int,_e:int>>"))
    joined = joined.withColumn("_ivs", F.sort_array(iv))
    starts = F.concat(
        F.array(F.lit(0)), F.transform(F.col("_ivs"), lambda p: p["_e"])
    )
    ends = F.concat(
        F.transform(F.col("_ivs"), lambda p: p["_s"]),
        F.array(F.size("_tk")),
    )
    joined = joined.withColumn(
        "_gaps",
        F.filter(
            F.zip_with(starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))),
            lambda p: p["e"] > p["s"],
        ),
    )
    joined = joined.withColumn(
        "_kept",
        F.flatten(
            F.transform(
                F.col("_gaps"),
                lambda p: F.slice(F.col("_tk"), p["s"] + 1, p["e"] - p["s"]),
            )
        ),
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", F.col("_kept")).alias(text_col),
        F.size("_tk").cast("long").alias("n_tokens"),
        (F.size("_tk") - F.size("_kept")).cast("long").alias("n_tokens_removed"),
    )
