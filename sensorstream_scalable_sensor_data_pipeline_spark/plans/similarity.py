"""Similarity search over the ``embeddings`` table (SURVEY §2.12):
brute-force cosine top-k as the exactness baseline, an IVF-style
partition-probed variant as the scale path, and a sign-LSH bucketing
variant. Top-k ranking literature: PAPERS.md (EDBT'20 / ICDE'21
threshold-&-rank algorithms); the Spark realization is the built-in
Window group-limit (operators/topk.py) — Catalyst pushes ``rn <= k``
into the window sort so each partition retains only k rows per query.

All cosines are grid-exact (functions/vectors.py), so ranks and
thresshold cuts are deterministic across engines — which is what makes
a *similarity ranking* oracle-checkable at all. Ties broken by
neighbor id in every query.

Scale notes: the query side is always the small side — broadcast it;
the corpus scan is then shuffle-free for brute force, and the IVF /
LSH variants add one keyed equi-join on the coarse bucket (uniform
for IVF with balanced centroids; sign-LSH bucket occupancy is
data-dependent and AQE-skew-splittable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.functions.vectors import (
    grid_cosine_sql,
    grid_dot,
)
from sensorstream_scalable_sensor_data_pipeline_spark.plans.registry import query
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

#: Query subset: every 100th vector plays the "incoming query" role.
_QUERY_PRED = "vec_id % 100 = 0"
_K = 5

_COS_QC = grid_cosine_sql("q.embedding", "c.embedding")


def _queries_and_corpus(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").alias("c_emb"),
        F.col("label").alias("c_label"),
        grid_dot(F.col("embedding"), F.col("embedding")).alias("c_n2"),
    )
    qs = emb.filter(F.expr(_QUERY_PRED)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
        grid_dot(F.col("embedding"), F.col("embedding")).alias("q_n2"),
    )
    return qs, corpus


def _topk(scored: DataFrame, k: int = _K) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


@query(
    "sim_topk_cosine",
    oracle=f"""
    SELECT query_id, nbr_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             {_COS_QC} AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_COS_QC} DESC, c.vec_id ASC
             ) AS rank
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.{_QUERY_PRED}
    ) WHERE rank <= {_K}
    """,
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the (small) query set
    against the full corpus, rank per query with a window group-limit.
    The corpus side never shuffles for scoring — the only shuffle is
    the per-query top-k (keyed by query_id, k rows survive per
    partition before the shuffle). This is the exactness baseline the
    ANN variants are measured against; at 100 TB you run it only on
    sampled slices."""
    qs, corpus = _queries_and_corpus(spark, sf_dir)
    scored = (
        F.broadcast(qs)
        .join(corpus, F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            (
                grid_dot(F.col("q_emb"), F.col("c_emb"))
                / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("c_n2")))
            ).alias("cosine"),
        )
    )
    return _topk(scored)


@query(
    "sim_ann_ivf",
    oracle=f"""
    SELECT query_id, nbr_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             {_COS_QC} AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_COS_QC} DESC, c.vec_id ASC
             ) AS rank
      FROM embeddings q JOIN embeddings c
        ON c.label = q.label AND c.vec_id <> q.vec_id
      WHERE q.{_QUERY_PRED}
    ) WHERE rank <= {_K}
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: probe only the query's coarse
    partition (``label`` stands in for the offline k-means centroid
    assignment; nprobe=1). The scoring join is a keyed equi-join on
    the centroid id, so scored pairs shrink by ~×(#centroids) versus
    brute force — the standard recall/cost dial. Same ranking tail as
    the exact query."""
    qs, corpus = _queries_and_corpus(spark, sf_dir)
    scored = (
        F.broadcast(qs)
        .join(
            corpus,
            (F.col("c_label") == F.col("q_label"))
            & (F.col("nbr_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "nbr_id",
            (
                grid_dot(F.col("q_emb"), F.col("c_emb"))
                / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("c_n2")))
            ).alias("cosine"),
        )
    )
    return _topk(scored)


# Sign-LSH: bucket = sign bits of the first 8 dimensions. A random-
# hyperplane LSH with axis-aligned planes — deterministic, engine-
# portable, and a real bucketing scheme for unit-ish embeddings.
_SIGN_BITS = 8


def _sign_bucket(emb) -> F.Column:
    bits = [
        F.when(emb[i].cast("double") >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(_SIGN_BITS)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _sign_bucket_sql(e: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN CAST({e}[{i + 1}] AS DOUBLE) >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_SIGN_BITS)
    )
    return f"({terms})"


@query(
    "sim_ann_signlsh",
    oracle=f"""
    SELECT query_id, nbr_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             {_COS_QC} AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_COS_QC} DESC, c.vec_id ASC
             ) AS rank
      FROM embeddings q JOIN embeddings c
        ON {_sign_bucket_sql("c.embedding")} = {_sign_bucket_sql("q.embedding")}
       AND c.vec_id <> q.vec_id
      WHERE q.{_QUERY_PRED}
    ) WHERE rank <= {_K}
    """,
)
def sim_ann_signlsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-sign LSH top-k: 8 sign bits of the leading
    dimensions form a 256-way bucket key; score only same-bucket
    pairs. Deterministic axis-aligned planes keep it oracle-checkable;
    production would rotate with a seeded random matrix (same plan
    shape — the bucket id is still a per-row codegen expression
    feeding one keyed join)."""
    qs, corpus = _queries_and_corpus(spark, sf_dir)
    qs = qs.withColumn("bucket", _sign_bucket(F.col("q_emb")))
    corpus = corpus.withColumn("bucket", _sign_bucket(F.col("c_emb")))
    scored = (
        F.broadcast(qs)
        .join(corpus, ["bucket"])
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            (
                grid_dot(F.col("q_emb"), F.col("c_emb"))
                / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("c_n2")))
            ).alias("cosine"),
        )
    )
    return _topk(scored)
