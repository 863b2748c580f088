"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Runs the engine's headline queries (the pipeline flagship, rollup,
TPC-H-shaped analytics heads, pivot, text analytics) on
``local[$SPARK_GRAFT_CPUS]`` against ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with a cheap ``count()`` over the full
result (no driver-side collect of wide rows — we time plan execution,
not Arrow transfer). A warmup run of the smallest query absorbs
JVM/session startup so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: Headline benchmark heads: the reference's end-to-end pipeline flow,
#: the hypertable rollup, the analytics suite, reshaping, and the
#: north-star text/dedup/similarity extensions.
HEADLINE = [
    "sensor_pipeline_e2e",
    "sensor_hourly_rollup",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "topk_per_group",
    "w1_pivot_wide",
    "text_token_stats",
    "text_quality_score",
]


def main() -> None:
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
    )

    from sensorstream_scalable_sensor_data_pipeline_spark import plans

    queries = plans.all_queries()
    heads = [h for h in HEADLINE if h in queries]
    # Optional extension heads (registered in later milestones).
    for extra in (
        "dedup_exact",
        "dedup_minhash_lsh",
        "sim_topk_cosine",
    ):
        if extra in queries and extra not in heads:
            heads.append(extra)

    # Warmup: absorb session/codegen startup cost.
    queries[heads[0]](spark, SF_DIR).limit(1).count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in heads:
        t0 = time.time()
        queries[name](spark, SF_DIR).count()
        dt = round(time.time() - t0, 3)
        per_query[name] = dt
        total += dt

    sf = None
    base = os.path.basename(SF_DIR.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass

    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "cpus": CPUS,
                "sf_dir": SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
