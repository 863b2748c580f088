"""The bench harness skips (with a stderr note) any head that fails —
which means a renamed or unregistered query would silently vanish from
the graded suite. Pin that every HEADLINE name resolves to a callable
and that the 19 r2 heads are still present for round-over-round
comparison."""

from __future__ import annotations

import importlib

import bench
from sensorstream_scalable_sensor_data_pipeline_spark import plans

R2_HEADS = {
    "sensor_pipeline_e2e",
    "sensor_hourly_rollup",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "topk_per_group",
    "w1_pivot_wide",
    "text_token_stats",
    "text_quality_score",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "w2_sessionize",
    "sensor_sliding_rollup",
    "stream_hourly_rollup",
    "q6_forecast_revenue",
    "docs_curate_corpus",
    "sim_ann_ivf",
    "sim_ann_signlsh",
}


def test_all_headline_heads_resolve():
    registered = plans.all_queries()
    for name in bench.HEADLINE:
        if name in bench.EXTRA_HEADS:
            mod, attr = bench.EXTRA_HEADS[name]
            fn = getattr(importlib.import_module(mod), attr)
        else:
            fn = registered.get(name)
        assert callable(fn), f"bench head {name!r} does not resolve"


def test_r2_heads_still_benched():
    assert R2_HEADS <= set(bench.HEADLINE)
    # 20 carried heads (r2 set + curate_training_corpus) + r5's
    # temporal family and persisted-IVF build/serve pair + r6's SQ8
    # serving tier, hot-key skew pair, and the semdedup/anomaly/
    # streaming-session trio + r8's large-corpus serving pair and
    # span-level substring dedup + r9's stream-stream as-of head and
    # span-enabled curation capstone + r9 session 2's IVFPQ serving
    # tier + r10's HTML-extraction and EWMA-recurrence heads + r11's
    # perceptual-hash image dedup, streaming funnel, and audio
    # fingerprint dedup + r13's decontamination twins (survivor
    # counts asserted in-head) + r16's incremental near-dup text
    # ingest (structural invariants asserted in-head).
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE)) == 46
    assert {
        "curate_training_corpus",
        "asof_join",
        "range_join",
        "resample_locf",
        "rate_of_change",
        "ivf_index_build",
        "ivf_query_batch",
        "ivf_query_batch_sq8",
        "asof_join_skewed",
        "asof_join_skewed_bucketed",
        "semdedup",
        "rolling_zscore",
        "stream_sessionize",
        "ivf_serve_large",
        "ivf_serve_large_sq8",
        "dedup_substring",
        "stream_asof_join",
        "curate_with_span_dedup",
        "ivf_serve_large_pq",
    } <= set(bench.HEADLINE)


def test_setup_hooks_resolve():
    """A head with an untimed setup hook must expose it under the
    documented name; the serving heads depend on it for the
    build/serve separation."""
    for head in (
        "ivf_query_batch",
        "ivf_query_batch_sq8",
        "ivf_serve_large",
        "ivf_serve_large_sq8",
        "ivf_serve_large_pq",
        "stream_asof_join",
    ):
        mod, attr = bench.EXTRA_HEADS[head]
        m = importlib.import_module(mod)
        assert callable(getattr(m, f"{attr}_setup"))
