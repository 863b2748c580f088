"""Physical-plan shape assertions — the scale contract, pinned.

Correctness says the numbers match; these tests say the PLAN is the
one that survives 100×: filters reach the parquet scan, dimension
joins broadcast (the fact side never shuffles for enrichment), grouped
top-k uses the window group-limit, and nothing degenerates into a
cartesian product. A regression here is invisible at sf0.01 and fatal
at 100 TB — hence tests, not eyeballs.
"""

from __future__ import annotations

import pytest

from sensorstream_scalable_sensor_data_pipeline_spark import plans

QUERIES = plans.all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "p6_range_cutoff")
    # the cutoff bounds must reach the parquet reader (row-group
    # pruning), not sit in a post-scan Filter — requires comparing the
    # RAW int64 column, not the converted timestamp
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "GreaterThanOrEqual(ts" in pushed, pushed
    assert "LessThan(ts" in pushed, pushed


def test_enrichment_join_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j1_broadcast_enrich")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pipeline_flagship_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sensor_pipeline_e2e")
    assert "BroadcastHashJoin" in plan
    # exactly one exchange: the dedup aggregation; enrichment must not
    # shuffle the fact side
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_topk_uses_window_group_limit(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_per_group")
    assert "WindowGroupLimit" in plan


def test_semi_join_stays_semi(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j3_semi_join")
    assert "LeftSemi" in plan


def test_no_cartesian_anywhere_in_dedup(spark, sf_dir):
    for name in [
        "dedup_minhash_lsh",
        "dedup_ngram_blocked",
        "dedup_simhash",
        "dedup_embedding_cosine",
    ]:
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "s1_scan_project")
    # ReadSchema must not contain the unused wide columns
    assert "props" not in plan.split("ReadSchema")[1][:200]
