"""Warm-region measurement of the hot-key skew pair (r10 verdict
watch #2 → r11 task #7): make the operator-level win reproducible.

The cold-JVM bench pair (`asof_join_skewed` vs `_bucketed`) reads
only ~1.24-1.55× because ~6 s of shared cold floor — JVM/codegen
startup plus the amplification explode both heads pay identically —
dilutes the end-to-end ratio. The r10 decomposition showed the JOIN
itself wins ~2.3× warm; this script is that measurement as a
standing, re-runnable artifact: ONE session, each head run once
untimed (JIT + codegen + page-cache warm), then timed ``--reps``
times each, interleaved (plain, bucketed, plain, ...) so machine
drift hits both heads equally.

Usage:
    python scripts/warm_skew_pair.py [--reps N] [sf_dir]

Prints one JSON line per timed rep and a final summary
(medians + ratio). Curated numbers live in COVERAGE.md next to the
cold pair.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = list(sys.argv[1:])
    reps = 3
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.plans.temporal import (
        _skewed_events,
        _skewed_summary,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="warm-skew-pair",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    # Materialize the amplified inputs ONCE: the bench heads' scan-side
    # explode is a shared fixed cost both heads pay identically — the
    # r10 decomposition's point is the JOIN REGION, so the timed part
    # here starts from cached inputs.
    ev = _skewed_events(spark, sf_dir).persist()
    st = (
        ev.filter(F.col("event_id") % 97 == 0)
        .select("user_id", "ts", F.col("value").alias("calib_value"))
        .persist()
    )
    ev.count(), st.count()

    def plain():
        return _skewed_summary(
            asof_join(ev, st, on="user_id", time_col="ts", value_cols=["calib_value"])
        )

    def bucketed():
        return _skewed_summary(
            asof_join_bucketed(
                ev, st, on="user_id", time_col="ts", value_cols=["calib_value"]
            )
        )

    heads = {"asof_join_skewed": plain, "asof_join_skewed_bucketed": bucketed}
    # warm pass: full run of each join, untimed (JIT + codegen caches)
    for fn in heads.values():
        fn().collect()
    samples: dict[str, list[float]] = {n: [] for n in heads}
    for _ in range(reps):
        for name, fn in heads.items():
            t0 = time.time()
            rows = len(fn().collect())
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            print(json.dumps({"head": name, "sec": dt, "rows": rows}))
    def median(v: list) -> float:
        v = sorted(v)
        m = len(v) // 2
        return v[m] if len(v) % 2 else (v[m - 1] + v[m]) / 2.0

    med = {n: median(v) for n, v in samples.items()}
    print(
        json.dumps(
            {
                "summary": True,
                "sf_dir": sf_dir,
                "reps": reps,
                "warm_median": med,
                "warm_ratio_plain_over_bucketed": round(
                    med["asof_join_skewed"]
                    / med["asof_join_skewed_bucketed"],
                    2,
                ),
                "samples": samples,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
