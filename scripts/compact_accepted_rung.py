"""Accepted-corpus compaction rung (r15): show that the corpus read
(``read_accepted``) degrades with the COMMITTED EPOCH COUNT at fixed
row count — the streaming face turns every micro-batch into one
``accepted/batch=*`` dir — and that one tiered ``compact_accepted``
pass flattens it without shuffling payload bytes.

Protocol: ingest the documents corpus (text family — the cheapest to
synthesize at volume) as N committed epochs of equal size, same TOTAL
rows at every rung, then time ``read_accepted`` + a representative
corpus consumer (count + a column aggregate forcing real reads)
fragmented vs compacted, recording the accepted tree's file count
each side. Medians of 3 in-session reps after a warmup; one JSON
line per rung.

Usage:
    python scripts/compact_accepted_rung.py [--epochs 16,64,256]
        [--rows 100000]
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


def _tree_files(root: str) -> int:
    n = 0
    for _, _, files in os.walk(root):
        n += sum(1 for f in files if f.startswith("part-"))
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", default="16,64,256")
    ap.add_argument("--rows", type=int, default=100_000)
    args = ap.parse_args()
    rungs = [int(x) for x in args.epochs.split(",")]

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_incremental import (
        compact_accepted,
        ingest_batch,
        read_accepted,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="compact-accepted-rung",
        master="local[32]",
        shuffle_partitions="32",
    )
    spark.range(1000).count()  # session warmup

    for n_epochs in rungs:
        root = tempfile.mkdtemp(prefix="accept_rung_")
        sdir = os.path.join(root, "state")
        per = args.rows // n_epochs
        for e in range(n_epochs):
            batch = spark.range(e * per, (e + 1) * per, 1, 1).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("doc body "), F.col("id")).alias("text"),
            )
            # maintenance off: the rung MEASURES the fragmentation the
            # inline default prevents
            ingest_batch(
                spark, batch, sdir, batch_id=f"e{e}",
                maintain_max_batch_dirs=None,
            )

        def consume():
            df = read_accepted(spark, sdir)
            assert df.count() == per * n_epochs
            df.agg(F.sum(F.length("text"))).collect()

        files_before = _tree_files(os.path.join(sdir, "accepted"))
        frag = _median3(consume)
        t0 = time.time()
        folded = compact_accepted(spark, sdir)
        compact_cost = round(time.time() - t0, 3)
        files_after = _tree_files(os.path.join(sdir, "accepted"))
        comp = _median3(consume)
        print(
            json.dumps(
                {
                    "epochs": n_epochs,
                    "rows": per * n_epochs,
                    "files_before": files_before,
                    "files_after": files_after,
                    "read_fragmented_s": frag,
                    "read_compacted_s": comp,
                    "compact_cost_s": compact_cost,
                    "dirs_folded": folded,
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
