"""Scale rung for the crash-consistent incremental VIDEO ingest.

r12: `ingest_video_batch` completes the incremental family; this
harness mirrors scripts/ingest_image_rung.py — replay the staged
audio corpus as K sequential batches into a fresh state dir (every
batch pays within-batch probe/vote/verify dedup PLUS the cross-state
chain against all previously accepted fingerprints) and report
per-batch wall, accepted counts, and the STATE FOOTPRINT. The audio
state stores fingerprint SEQUENCES (~4 B/frame, ≈0.5 KB per 2 s
clip) rather than 16 B scalar hashes — the per-clip number is the
honest claim to watch, and it must stay FLAT as state accumulates.

Usage:
    python scripts/ingest_video_rung.py <sf_dir> [n_batches] [max_hamming]
    # one JSON line per batch + one summary line

max_hamming defaults to 0 (the dedup default). The first sf0.1 run
measured the r12 exact-vs-fuzzy boundary AT RUNG SCALE: exact-value
matching accepted 4 007 of 5 000 — six q85 re-encode variants whose
bit-exact frame tails fall under the vote — while radius 2 accepts
exactly 4 001 = N − 999, perfect recall (see COVERAGE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    max_hamming = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_incremental import (
        ingest_video_batch,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.plans import multimodal as mm
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="ingest-audio-rung",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    mm._ensure_corpus(spark, sf_dir, "video", mm._video_corpus)
    corpus = mm._read_corpus(spark, sf_dir, "video", mm._video_corpus)
    state_dir = tempfile.mkdtemp(prefix="ingest_video_rung_")
    try:
        total_in = total_acc = 0
        t_all = time.time()
        for b in range(n_batches):
            # round-robin BLOCKS of 100 consecutive clip ids: planted
            # variants (vid_id ≡ 0 mod 5 of vid_id−1) are id-adjacent,
            # so most collapse within their batch while pairs
            # straddling a block boundary (~1 %) land in different
            # batches and exercise the cross-state chain
            batch = corpus.filter(
                F.pmod(F.floor(F.col("doc_id") / 100), n_batches) == b
            )
            n_in = batch.count()
            t0 = time.time()
            accepted = ingest_video_batch(
                spark, batch, state_dir, every_n=2,
                max_hamming=max_hamming, batch_id=f"b{b}"
            ).count()
            dt = time.time() - t0
            state_bytes = _du(os.path.join(state_dir, "frame_phashes"))
            total_in += n_in
            total_acc += accepted
            print(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "max_hamming": max_hamming,
                        "batch": b,
                        "rows_in": n_in,
                        "accepted": accepted,
                        "sec": round(dt, 2),
                        "state_mb": round(state_bytes / 1e6, 2),
                        "state_bytes_per_clip": round(
                            state_bytes / max(total_acc, 1), 1
                        ),
                    }
                ),
                flush=True,
            )
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "summary": True,
                    "n_batches": n_batches,
                    "rows_in": total_in,
                    "accepted": total_acc,
                    "total_sec": round(time.time() - t_all, 2),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
