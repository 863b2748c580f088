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

``--table audio_fps`` (r13 verdict task #7) runs the same protocol
over the AUDIO state shape — ~110-word fingerprint-sequence rows,
477 B/clip, 30× wider than the image rows — and additionally times
the post-compaction ``read_audio_hubs`` call: compaction prunes the
superseded per-batch word-count tables, so the first hubs read
regenerates the compacted batch's counts from its durable
fingerprints (the backfill path); the second read is steady-state.

Usage:
    python scripts/compact_state_rung.py [--batches 8,32,128]
        [--rows 200000] [--table phashes|audio_fps]
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
    ap.add_argument("--table", default="phashes",
                    choices=["phashes", "audio_fps"])
    args = ap.parse_args()
    rungs = [int(x) for x in args.batches.split(",")]

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_incremental import (
        compact_state,
        read_audio_state,
        read_audio_hubs,
        read_image_state,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="compact-rung", master="local[32]", shuffle_partitions="32"
    )
    spark.range(1000).count()  # session warmup
    table = args.table
    for n_batches in rungs:
        root = tempfile.mkdtemp(prefix="compact_rung_")
        sdir = os.path.join(root, "state")
        per_batch = args.rows // n_batches
        for b in range(n_batches):
            # one small file per batch dir — the daily-ingest shape
            rng = spark.range(b * per_batch, (b + 1) * per_batch, 1, 1)
            if table == "phashes":
                df = rng.select(
                    F.xxhash64("id").alias("phash"),
                    F.lower(
                        F.hex(F.shiftrightunsigned(F.xxhash64("id"), 60))
                    ).alias("fp_prefix"),
                    F.col("id").alias("doc_id"),
                )
                df.write.partitionBy("fp_prefix").parquet(
                    os.path.join(sdir, table, f"batch=b{b:04d}")
                )
            else:
                # audio shape: ~110 int32 words/clip ≈ 477 B/clip —
                # the fingerprint-sequence rows the BER verify needs
                df = rng.select(
                    F.col("id").alias("doc_id"),
                    F.transform(
                        F.sequence(F.lit(1), F.lit(110)),
                        lambda i: F.pmod(
                            F.xxhash64(F.col("id") * 1000 + i),
                            F.lit(2147483647),
                        ).cast("int"),
                    ).alias("fp"),
                )
                df.write.parquet(
                    os.path.join(sdir, table, f"batch=b{b:04d}")
                )

        if table == "phashes":
            def scan():
                # listing + footer + scan: the per-ingest state cost
                st = read_image_state(spark, sdir)
                st.groupBy().agg(F.count("*"), F.sum("doc_id")).collect()
        else:
            def scan():
                st = read_audio_state(spark, sdir)
                st.groupBy().agg(
                    F.count("*"), F.sum(F.size("fp"))
                ).collect()

        def count_files(p):
            tot = 0
            for _, _, files in os.walk(p):
                tot += len([f for f in files if f.endswith(".parquet")])
            return tot

        frag_files = count_files(os.path.join(sdir, table))
        frag = _median3(scan)
        extra = {}
        if table == "audio_fps":
            # pre-compaction hubs (writes per-batch count tables)
            t0 = time.time()
            read_audio_hubs(spark, sdir, 1024).count()
            extra["hubs_initial_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        n_src = compact_state(spark, sdir, table)
        compact_secs = round(time.time() - t0, 3)
        comp = _median3(scan)
        if table == "audio_fps":
            # first post-compaction hubs read REGENERATES the
            # compacted batch's counts from durable fps (backfill)
            t0 = time.time()
            read_audio_hubs(spark, sdir, 1024).count()
            extra["hubs_backfill_s"] = round(time.time() - t0, 3)
            t0 = time.time()
            read_audio_hubs(spark, sdir, 1024).count()
            extra["hubs_steady_s"] = round(time.time() - t0, 3)

        print(
            json.dumps(
                {
                    "table": table,
                    "n_batches": n_batches,
                    "rows": args.rows,
                    "fragmented_files": frag_files,
                    "fragmented_read_s": frag,
                    "compacted_read_s": comp,
                    "compact_cost_s": compact_secs,
                    "compacted_files": count_files(
                        os.path.join(sdir, table)
                    ),
                    "n_sources": n_src,
                    **extra,
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
