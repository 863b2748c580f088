"""Persisted IVF index: build/query parity with the one-shot head,
and the partition-pruning contract that makes inverted lists real."""

from __future__ import annotations

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
