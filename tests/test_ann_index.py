"""Persisted IVF index: build/query parity with the one-shot head,
and the partition-pruning contract that makes inverted lists real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.ann_index import (
    build_ivf_index,
    load_ivf_lists,
    query_ivf_index,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table


def test_index_query_matches_one_shot_head(spark, sf_dir, tmp_path):
    """Same quantizer, same query subset, same (k, nprobe) ⇒ the
    persisted-index path must return exactly the one-shot head's
    results — the index is a layout change, not a semantics change."""
    from sensorstream_scalable_sensor_data_pipeline_spark.plans.similarity import (
        sim_ann_ivf,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_ivf_index(spark, emb, str(tmp_path / "ivf"))
    queries = emb.filter(F.expr("vec_id % 100 = 0")).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["nbr_id"], r["rank"])
        for r in query_ivf_index(spark, idx, queries, k=5, nprobe=2).collect()
    }
    want = {
        (r["query_id"], r["nbr_id"], r["rank"])
        for r in sim_ann_ivf(spark, sf_dir).collect()
    }
    assert got == want and got


def test_probed_list_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """Probing must become PartitionFilters on j — reading nprobe/k of
    the corpus BYTES is the entire point of materialized inverted
    lists."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_ivf_index(spark, emb, str(tmp_path / "ivf"))
    spark.catalog.clearCache()
    pruned = load_ivf_lists(spark, idx, probe_js=[0, 3])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "j" in pf and "IN" in pf.upper(), plan
    # and the pruned scan returns only those lists
    assert {r["j"] for r in pruned.select("j").distinct().collect()} <= {0, 3}


def test_index_layout_on_disk(spark, sf_dir, tmp_path):
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_ivf_index(spark, emb, str(tmp_path / "ivf"), k=10)
    lists = os.path.join(idx, "lists")
    j_dirs = [d for d in os.listdir(lists) if d.startswith("j=")]
    assert len(j_dirs) == 10  # one inverted list per centroid
    cent = spark.read.parquet(os.path.join(idx, "centroids"))
    assert cent.count() == 10


def test_quantized_ivf_index_serves_with_high_agreement(spark, sf_dir, tmp_path):
    """SQ8-stored inverted lists (codes+scale instead of floats) must
    keep the IVF contract: same partition layout, every query
    answered, and neighbor sets in high agreement with the
    float-stored index (quantization only perturbs near-ties)."""
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    fidx = build_ivf_index(spark, emb, str(tmp_path / "f"), k=10)
    qidx = build_ivf_index(spark, emb, str(tmp_path / "q"), k=10, quantize=True)
    # storage form: codes+scale, no float embedding column on disk
    qlists = spark.read.parquet(os.path.join(qidx, "lists"))
    assert "codes" in qlists.columns and "embedding" not in qlists.columns
    assert dict(qlists.dtypes)["codes"] == "array<tinyint>"
    assert len(
        [d for d in os.listdir(os.path.join(qidx, "lists")) if d.startswith("j=")]
    ) == 10
    queries = emb.filter(F.expr("vec_id % 100 = 0")).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    fpairs = {
        (r["query_id"], r["nbr_id"])
        for r in query_ivf_index(spark, fidx, queries, k=5, nprobe=2).collect()
    }
    n_queries = queries.count()
    # both SQ8 scoring paths: symmetric int8 ADC (the default/auto
    # fast path) and dequantize (exact dequantized-cosine parity)
    for mode in ("int8", "dequant"):
        qpairs = {
            (r["query_id"], r["nbr_id"])
            for r in query_ivf_index(
                spark, qidx, queries, k=5, nprobe=2, score=mode
            ).collect()
        }
        assert len(qpairs) == 5 * n_queries  # every query fully answered
        assert len(fpairs & qpairs) / len(fpairs) >= 0.8
    with pytest.raises(ValueError):
        query_ivf_index(spark, qidx, queries, score="fp16")


def test_ivf_train_sampled_path_produces_k_seeds(spark, sf_dir):
    """The hash-bucket training sample has SPARSE vec_ids, where the
    dense-id modulo seeding would select ~k·per_mille/1000 seeds
    (possibly zero) and silently train a degenerate quantizer. The
    sampled path must still seed exactly k clusters (min-id per md5
    stratum) and train a usable quantizer."""
    from sensorstream_scalable_sensor_data_pipeline_spark.plans.similarity import (
        ivf_train,
        ivf_training_sample,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    k = 10
    trained = ivf_train(spark, emb, k=k, sample_per_mille=400)
    assert len(trained) == k
    assert sorted(j for j, _ in trained) == list(range(k))
    dim = len(emb.select("embedding").first()["embedding"])
    assert all(len(c) == dim for _, c in trained)
    # the quantizer is non-degenerate: centroids are not all identical
    assert len({tuple(round(x, 9) for x in c) for _, c in trained}) > 1
    # and the sample really is sparse-id (the bug's precondition)
    ids = [r["vec_id"] for r in ivf_training_sample(emb, 400).select("vec_id").collect()]
    assert ids and max(ids) >= len(ids)  # ids are NOT dense 0..n-1


def test_ivf_sampled_index_end_to_end(spark, sf_dir, tmp_path):
    """build_ivf_index(sample_per_mille=...) — the advertised
    sparse-corpus path — must produce a queryable index with every
    query answered (k neighbors each)."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_ivf_index(
        spark, emb, str(tmp_path / "ivf_s"), k=8, sample_per_mille=400
    )
    queries = emb.filter(F.expr("vec_id % 100 = 0")).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = query_ivf_index(spark, idx, queries, k=5, nprobe=2)
    n_queries = queries.count()
    per_q = got.groupBy("query_id").count().collect()
    assert len(per_q) == n_queries
    assert all(r["count"] == 5 for r in per_q)


def test_append_matches_full_rebuild_assignment(spark, sf_dir, tmp_path):
    """Index built on HALF the corpus, other half appended against the
    frozen centroids: the appended rows' list assignment must equal a
    one-shot assignment of the full corpus under the SAME centroids,
    and queries over the appended index must return appended vectors.
    Drift of an in-distribution batch stays near the corpus's own
    baseline."""
    from pyspark.sql import functions as F

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.ann_index import (
        append_to_ivf_index,
        assignment_drift,
        build_ivf_index,
        query_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    half_a = emb.filter("vec_id % 2 = 0")
    half_b = emb.filter("vec_id % 2 = 1")
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, half_a, idx, k=8)
    n = append_to_ivf_index(spark, idx, half_b)
    assert n == half_b.count()
    lists = spark.read.parquet(f"{idx}/lists")
    assert lists.count() == emb.count()
    assert lists.select("vec_id").distinct().count() == emb.count()

    # appended rows sit exactly where the frozen argmin puts them
    cent = spark.read.parquet(f"{idx}/centroids")
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.ann_index import _grid_l2

    want = (
        half_b.crossJoin(F.broadcast(cent))
        .select("vec_id", "j", _grid_l2(F.col("embedding"), F.col("c")).alias("d"))
        .groupBy("vec_id")
        .agg(F.min_by("j", F.struct("d", "j")).alias("j"))
    )
    got = lists.join(half_b.select("vec_id"), "vec_id", "left_semi").select(
        "vec_id", "j"
    )
    assert {(r["vec_id"], r["j"]) for r in got.collect()} == {
        (r["vec_id"], r["j"]) for r in want.collect()
    }

    # a query whose exact nearest neighbor was APPENDED finds it
    q = half_b.limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = query_ivf_index(spark, idx, q, k=5, nprobe=3).collect()
    assert res  # appended content is servable
    qid = q.collect()[0]["query_id"]
    assert all(r["query_id"] == qid for r in res)

    # drift: an in-distribution batch reads close to the corpus baseline
    base = assignment_drift(spark, idx, half_a)
    drift = assignment_drift(spark, idx, half_b)
    assert drift <= 2.0 * base


def test_sq8_int8_scoring_matches_duckdb_replay(spark, duck, sf_dir, tmp_path):
    """Engine determinism of the int8 ADC cosine: for served pairs,
    DuckDB replaying the SAME arithmetic — quantize the query
    (round-half-away, 127/absmax), exact BIGINT code dot, then
    ((q_scale·scale)·dot) / (sqrt((q_scale²)·qdot)·sqrt(n2)) — must
    reproduce Spark's cosine EXACTLY (integer dot is exact; every
    float op is a single IEEE operation in the same order)."""
    import os

    from sensorstream_scalable_sensor_data_pipeline_spark.functions.vectors import (
        int_dot_sql,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qidx = build_ivf_index(spark, emb, str(tmp_path / "adc"), k=10, quantize=True)
    queries = emb.filter(F.expr("vec_id % 200 = 0")).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = query_ivf_index(spark, qidx, queries, k=3, nprobe=2, score="int8").collect()
    assert got
    lists_glob = os.path.join(qidx, "lists", "*", "*.parquet")
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"]))[:6]:
        sql = f"""
        WITH q AS (
          SELECT embedding,
                 list_max(list_transform(embedding,
                          x -> abs(CAST(x AS DOUBLE)))) AS am
          FROM embeddings WHERE vec_id = {r['query_id']}
        ),
        qq AS (
          SELECT CASE WHEN am = 0
                   THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                   ELSE list_transform(embedding,
                          x -> CAST(round(CAST(x AS DOUBLE) * 127 / am)
                               AS BIGINT)) END AS qc,
                 am / 127 AS qscale
          FROM q
        ),
        c AS (
          SELECT codes, scale, n2
          FROM read_parquet('{lists_glob}') WHERE vec_id = {r['nbr_id']}
        )
        SELECT ((qscale * scale) * {int_dot_sql('qc', 'codes')})
               / (sqrt((qscale * qscale) * {int_dot_sql('qc', 'qc')})
                  * sqrt(n2)) AS cosine
        FROM qq, c
        """
        val = duck.sql(sql).fetchone()[0]
        assert val == r["cosine"], (r["query_id"], r["nbr_id"], val, r["cosine"])
