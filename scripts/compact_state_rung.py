"""State-compaction rung (r12 verdict task #5): show that
``read_*_state`` wall grows with the COMMITTED BATCH COUNT at fixed
row count — the small-files term the reference's X4 listing lesson
(main_pipeline.py:226-230) warns about, applied to dedup state — and
that one ``compact_state`` call flattens it.

Protocol: synthesize image-dedup state (the narrowest family,
16 B/row — worst files-to-bytes ratio) as N batch dirs × R rows,
same TOTAL rows at every rung, then time ``read_image_state`` +
count and a representative state-side probe (the hash anti-join's
state scan) before and after compaction. Every number is a median of
3 in-session reps after a warmup. Output: one JSON line per rung.

Usage:
    python scripts/compact_state_rung.py [--batches 8,32,128] [--rows 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _median3(fn) -> float:
    vals = []
    for _ in range(3):
        t0 = time.time()
        fn()
        vals.append(time.time() - t0)
    return round(sorted(vals)[1], 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,32,128")
    ap.add_argument("--rows", type=int, default=200_000)
    args = ap.parse_args()
    rungs = [int(x) for x in args.batches.split(",")]

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_incremental import (
        compact_state,
        read_image_state,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="compact-rung", master="local[32]", shuffle_partitions="32"
    )
    spark.range(1000).count()  # session warmup
    for n_batches in rungs:
        root = tempfile.mkdtemp(prefix="compact_rung_")
        sdir = os.path.join(root, "state")
        per_batch = args.rows // n_batches
        for b in range(n_batches):
            # one small file per batch dir — the daily-ingest shape
            spark.range(b * per_batch, (b + 1) * per_batch, 1, 1).select(
                F.xxhash64("id").alias("phash"),
                F.lower(
                    F.hex(F.shiftrightunsigned(F.xxhash64("id"), 60))
                ).alias("fp_prefix"),
                F.col("id").alias("doc_id"),
            ).write.partitionBy("fp_prefix").parquet(
                os.path.join(sdir, "phashes", f"batch=b{b:04d}")
            )

        def scan():
            # listing + footer + scan: the per-ingest state-read cost
            st = read_image_state(spark, sdir)
            st.groupBy().agg(F.count("*"), F.sum("doc_id")).collect()

        def count_files(p):
            tot = 0
            for _, _, files in os.walk(p):
                tot += len([f for f in files if f.endswith(".parquet")])
            return tot

        frag_files = count_files(os.path.join(sdir, "phashes"))
        frag = _median3(scan)
        t0 = time.time()
        n_src = compact_state(spark, sdir, "phashes")
        compact_secs = round(time.time() - t0, 3)
        comp = _median3(scan)

        print(
            json.dumps(
                {
                    "n_batches": n_batches,
                    "rows": args.rows,
                    "fragmented_files": frag_files,
                    "fragmented_read_s": frag,
                    "compacted_read_s": comp,
                    "compact_cost_s": compact_secs,
                    "compacted_files": count_files(
                        os.path.join(sdir, "phashes")
                    ),
                    "n_sources": n_src,
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
