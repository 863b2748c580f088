"""r16 optimization pins: the Arrow/NumPy candidate scorers must be
BIT-identical to the Catalyst expression path they replaced — same
rows, same ranks, same cosine doubles (no tolerance). The serving
semantics are otherwise pinned by test_ann_index/test_pq; this file
pins arrow-vs-expr directly so a future NumPy/Arrow version bump that
drifts an op sequence fails loudly at the operator, not at a bench
number."""

from __future__ import annotations

from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.ann_index import (
    build_ivf_index,
    query_ivf_index,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.pq import (
    build_ivfpq_index,
    query_ivfpq_index,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table


def _rows(df):
    return sorted(
        (r["query_id"], r["nbr_id"], r["rank"], r["cosine"])
        for r in df.collect()
    )


def _queries(emb):
    return emb.filter(F.expr("vec_id % 100 = 0")).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_float_arrow_scoring_equals_expr(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_ivf_index(spark, emb, str(tmp_path / "f"))
    q = _queries(emb)
    got = _rows(query_ivf_index(spark, idx, q, k=5, nprobe=2, impl="arrow"))
    want = _rows(query_ivf_index(spark, idx, q, k=5, nprobe=2, impl="expr"))
    assert got == want and got  # exact doubles, no tolerance


def test_sq8_arrow_scoring_equals_expr(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_ivf_index(spark, emb, str(tmp_path / "q"), quantize=True)
    q = _queries(emb)
    for score in ("int8", "dequant"):
        got = _rows(
            query_ivf_index(spark, idx, q, k=5, nprobe=2, score=score, impl="arrow")
        )
        want = _rows(
            query_ivf_index(spark, idx, q, k=5, nprobe=2, score=score, impl="expr")
        )
        assert got == want and got, score


def test_ivfpq_arrow_scoring_equals_expr(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    for residual in (False, True):
        idx = build_ivfpq_index(
            spark, emb, str(tmp_path / f"pq{residual}"),
            k=6, m=8, ksub=16, residual=residual,
        )
        q = _queries(emb)
        got = _rows(query_ivfpq_index(spark, idx, q, k=3, nprobe=2, impl="arrow"))
        want = _rows(query_ivfpq_index(spark, idx, q, k=3, nprobe=2, impl="expr"))
        assert got == want and got, f"residual={residual}"


def test_bad_impl_raises(spark, sf_dir, tmp_path):
    import pytest

    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_ivf_index(spark, emb, str(tmp_path / "f2"))
    with pytest.raises(ValueError):
        query_ivf_index(spark, idx, _queries(emb), impl="pandas")
