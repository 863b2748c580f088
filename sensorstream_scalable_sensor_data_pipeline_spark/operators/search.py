"""Corpus keyword search: BM25 ranking (§2.12 text extension).

The retrieval complement to the similarity family: where ANN ranks by
embedding cosine, BM25 ranks by lexical term statistics — the
Okapi/Lucene scoring every search engine ships, expressed as three
aggregates and two keyed joins. No inverted-index service needed: at
query time the term filter IS the inverted-index probe (explode →
``isin(query_terms)`` keeps only postings for the query's terms, so
everything downstream is proportional to the postings touched, not
the corpus).

Scoring (the Lucene BM25 variant — IDF shifted positive):

    idf(t)  = ln( (N − df + 0.5) / (df + 0.5) + 1 )
    s(d,t)  = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    score(d) = Σ_t s(d,t)

Scale shape: doc lengths come from ``size(tokens)`` at scan speed (no
explode); the explode happens once and is immediately cut to query
terms; df/idf is a per-term aggregate over that filtered frame
(|terms| rows — broadcast); the per-doc sum is one map-side-combined
aggregate. Per-(doc,term) scores are floored onto the 1e-6 grid
before summing (functions/aggfns.py doctrine) so ranking is
partition-order independent; like the unigram scorer, ``ln`` is libm
whose last ulp may differ across engines — local oracles compare
with tolerance, not hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 1_000_000.0


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 scores for ``query_terms``: (id, score,
    n_terms_matched). Documents matching no term are absent (a real
    engine never scores the whole corpus). Terms are matched against
    the shared lowercase tokenizer (operators/text.py) — pass
    lowercase terms; duplicates in ``query_terms`` are collapsed
    (standard bag-of-words query semantics at weight 1)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.text import (
        tokenize_lower,
    )

    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    staged = docs.select(
        F.col(id_col), tokenize_lower(F.col(text_col)).alias("_tk")
    ).select(id_col, "_tk", F.size("_tk").alias("_dl"))
    # Two corpus scalars (N, avgdl) — exact ints to the driver, one job.
    tot = staged.agg(
        F.count(F.lit(1)).alias("n"), F.sum("_dl").alias("s")
    ).collect()[0]
    n_docs, avgdl = int(tot["n"]), float(int(tot["s"])) / int(tot["n"])
    # Postings probe: explode once, cut to the query's terms immediately.
    post = (
        staged.select(id_col, "_dl", F.explode("_tk").alias("_t"))
        .filter(F.col("_t").isin(terms))
        .groupBy(id_col, "_t", "_dl")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    df_t = post.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
    )
    weighted = post.join(F.broadcast(df_t.select("_t", idf.alias("_idf"))), "_t")
    tf = F.col("_tf").cast("double")
    denom = tf + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("_dl").cast("double") / F.lit(avgdl)
    )
    s = F.col("_idf") * tf * F.lit(float(k1 + 1.0)) / denom
    g = F.floor(s * F.lit(GRID)).cast("long")
    return weighted.groupBy(id_col).agg(
        (F.sum(g).cast("double") / F.lit(GRID)).alias("score"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )


def keyword_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a free-text query: tokenize the query
    with the SAME tokenizer as the corpus (anything else silently
    breaks matching), score with BM25, rank. ``orderBy().limit(k)``
    plans as TakeOrdered — a per-partition top-k plus one k-row merge,
    never a global sort. Ties break on id for a deterministic page."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.text import (
        tokenize_lower,
    )

    spark = docs.sparkSession
    q = [
        t
        for t in spark.range(1)
        .select(tokenize_lower(F.lit(query)).alias("_tk"))
        .collect()[0]["_tk"]
        if t  # splitting "" / all-whitespace yields empty tokens
    ]
    if not q:
        raise ValueError(f"query {query!r} tokenizes to nothing")
    scored = bm25_scores(docs, list(q), id_col, text_col, k1=k1, b=b)
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
