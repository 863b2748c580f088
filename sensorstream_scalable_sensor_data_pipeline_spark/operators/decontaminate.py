"""Train/benchmark decontamination (§2.12 extension): flag evaluation
documents whose token n-grams appear in the training corpus — the
overlap check (n-gram collision, the GPT-3/PaLM appendix method)
every serious training-data pipeline runs before reporting eval
numbers. The curation split (``operators/sampling.py::hash_split``)
guarantees no *document* crosses the fence; this operator catches the
subtler leak of shared *content* between distinct documents.

Method: both sides tokenize with the corpus-wide normalization
(``tokenize_lower``), form space-joined token ``n``-grams, and hash
them to fixed-width md5 keys. The training side reduces to its
DISTINCT gram-hash set (one map-side-combined hash aggregate — the
set is large but uniform-keyed); each eval document counts how many
of its distinct grams hit that set via one keyed join.

Scale notes: the join shuffles on a uniform 128-bit key — never
all-pairs, AQE-splittable, and at extreme scale the train gram set
can additionally be bloom-filtered onto the eval side before the
join (semi-join pushdown) without changing semantics. No driver
materialization; output is one row per eval document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.repetition import (
    token_ngrams,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.text import (
    tokenize_lower,
)


def _gram_hashes(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    staged = docs.select(
        F.col(id_col), tokenize_lower(F.col(text_col)).alias("_tk")
    )
    return staged.select(
        F.col(id_col),
        F.explode(token_ngrams(F.col("_tk"), n)).alias("_g"),
    ).select(F.col(id_col), F.md5(F.col("_g")).alias("gh"))


def ngram_contamination(
    train: DataFrame,
    evals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap_frac: float = 0.0,
) -> DataFrame:
    """Per eval document: ``(id, n_grams, n_overlap,
    contamination_frac, contaminated)`` where ``n_grams`` counts the
    document's DISTINCT token ``n``-grams, ``n_overlap`` how many of
    those also occur anywhere in ``train``, and ``contaminated`` is
    true when the overlap fraction EXCEEDS ``min_overlap_frac`` (the
    default 0.0 flags any single shared n-gram — the strict
    GPT-3-style criterion; raise it to tolerate boilerplate).

    Eval documents with fewer than ``n`` tokens have no grams to
    collide and report ``(0, 0, NULL, false)``.
    """
    train_set = _gram_hashes(train, id_col, text_col, n).select("gh").distinct()
    eval_grams = _gram_hashes(evals, id_col, text_col, n).distinct()
    hits = (
        eval_grams.join(
            train_set.withColumn("_hit", F.lit(1)), "gh", "left"
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_overlap"),
        )
    )
    # Gram-less eval docs never reach the explode; restore them.
    base = evals.select(F.col(id_col)).join(hits, id_col, "left")
    out = base.select(
        F.col(id_col),
        F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
        F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
        (
            F.col("n_overlap").cast("double")
            / F.nullif(F.col("n_grams"), F.lit(0).cast("long")).cast("double")
        ).alias("contamination_frac"),
    )
    return out.withColumn(
        "contaminated",
        F.coalesce(
            F.col("contamination_frac") > F.lit(min_overlap_frac), F.lit(False)
        ),
    )
