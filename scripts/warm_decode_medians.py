"""Warm-median protocol for the decode-dominated heads (r12 verdict
task #3: make compute drift detectable).

The standing bench protocol is COLD-JVM per rep — deliberate, for
round-over-round comparability — but on the decode-dominated heads
the cold protocol's wall band is ±25-40 % and this round's
decomposition (see COVERAGE.md r13 session log) measured WHY: a warm
in-JVM rep of `dedup_audio_head` runs 2.5× faster with HALF the
executor-task CPU (20.1 s / 291 tree-CPU-s / 140 exec-CPU-s cold vs
8.1 / 139 / 75 warm) — i.e. the band is substantially cold-JVM
JIT/interpretation tax, which is genuine CPU (so a CPU-seconds
metric alone does NOT collapse it; bench.py's `cpu_s` narrows the
band but still breathes ~1.4×).

This script is the drift INSTRUMENT: one JVM per head, one discarded
warm-up run of the head itself, then ``--reps`` timed warm reps.
Warm reps hold JIT state constant, so their median moves only when
the actual compute moves — a real 1.3× plan/code regression shows up
here even when the cold band could hide it. Run per-round, compare
medians against the table in COVERAGE.md.

Usage:
    python scripts/warm_decode_medians.py [--sf-dir DIR] [--reps N] [head ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: The decode-dominated heads (python-worker codec/FFT/DCT work
#: dominates; wall band ±25-40 % under the cold protocol).
DECODE_HEADS = [
    "dedup_phash",
    "dedup_audio",
    "dedup_video",
    "dedup_video_fuzzy",
    "curate_image_corpus",
    "decontaminate_audio",
    "decontaminate_video",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("heads", nargs="*", default=None)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    heads = args.heads or DECODE_HEADS

    import bench
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

    bench.SF_DIR = args.sf_dir
    results = {}
    for name in heads:
        fn, setup = bench._resolve_head(name)
        spark = get_spark(
            app_name=f"warm-{name}",
            master=f"local[{bench.CPUS}]",
            shuffle_partitions=max(bench.CPUS, 32),
        )
        try:
            if setup is not None:
                setup(spark, args.sf_dir)
            # discard run: pays JIT/codegen/worker-spawn once
            fn(spark, args.sf_dir).collect()
            secs, cpus, steals, iowaits = [], [], [], []
            for _ in range(args.reps):
                pre = bench._host_stat_ticks()
                c0, t0 = bench._tree_cpu_seconds(), time.time()
                fn(spark, args.sf_dir).collect()
                dt = time.time() - t0
                secs.append(round(dt, 3))
                cpus.append(round(bench._tree_cpu_seconds() - c0, 2))
                interf = bench._interference_cores(
                    pre, bench._host_stat_ticks(), dt
                )
                if interf is not None:
                    steals.append(interf[0])
                    iowaits.append(interf[1])
            med = sorted(secs)[len(secs) // 2]
            cmed = sorted(cpus)[len(cpus) // 2]
            results[name] = {
                "warm_median_s": med,
                "warm_samples_s": secs,
                "warm_cpu_median_s": cmed,
                "warm_cpu_samples_s": cpus,
                # r15: per-rep host-interference annotation (bench.py's
                # steal instrument) so outlier reps are adjudicated in
                # the record instead of by replay sessions
                "steal_cores_samples": steals,
                "iowait_cores_samples": iowaits,
            }
            print(
                f"  {name}: warm median {med}s of {secs} "
                f"(cpu {cmed}s of {cpus}; steal {steals}, iowait {iowaits})",
                file=sys.stderr,
                flush=True,
            )
        finally:
            spark.stop()
    print(json.dumps({"sf_dir": args.sf_dir, "reps": args.reps, "heads": results}))


if __name__ == "__main__":
    main()
