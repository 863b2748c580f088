"""Sustained micro-batching rung for the streaming ingest face (r16,
r15 verdict task #2): drive a REAL checkpointed ``stream_ingest``
query through ~64 availableNow epochs and show the continuous regime
holds — per-epoch wall stays FLAT (no O(history) term: each epoch's
anti-join is against committed state, inline ``maintain_state`` +
``compact_accepted`` amortize the sweeps), the state/corpus dir
counts stay BOUNDED at the maintenance threshold, provenance stays
one ``[lo, hi]`` interval, and the final corpus read matches a fresh
one-shot ingest of the same rows.

Protocol: pre-write one parquet file per epoch (equal row slices of a
synthesized text corpus, mtimes strictly ascending so FileStreamSource
delivers them in order), start ``stream_ingest`` with
``maxFilesPerTrigger=1`` and the DEFAULT inline maintenance, and time
each epoch inside the ``ingest_fn`` wrapper. Flatness is judged on
per-quartile medians (the 16-epoch maintenance spikes are amortized
inside each quartile). One JSON line at the end.

Usage:
    python scripts/stream_ingest_rung.py [--epochs 64] [--rows 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _batch_dirs(root: str) -> int:
    if not os.path.isdir(root):
        return 0
    return sum(1 for d in os.listdir(root) if d.startswith("batch="))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=64)
    ap.add_argument("--rows", type=int, default=100_000)
    args = ap.parse_args()

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_incremental import (
        ingest_batch,
        read_accepted,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark
    from sensorstream_scalable_sensor_data_pipeline_spark.streaming.ingest import (
        stream_ingest,
    )

    spark = get_spark(
        app_name="stream-ingest-rung",
        master="local[32]",
        shuffle_partitions="32",
    )
    spark.range(1000).count()  # session warmup

    root = tempfile.mkdtemp(prefix="stream_rung_")
    src = os.path.join(root, "src")
    sdir = os.path.join(root, "state")
    per = args.rows // args.epochs
    for e in range(args.epochs):
        batch = spark.range(e * per, (e + 1) * per, 1, 1).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc body "), F.col("id")).alias("text"),
        )
        d = os.path.join(root, f"stage{e}")
        batch.coalesce(1).write.parquet(d)
        part = next(n for n in os.listdir(d) if n.startswith("part-"))
        os.makedirs(src, exist_ok=True)
        dst = os.path.join(src, f"epoch{e:04d}.parquet")
        os.replace(os.path.join(d, part), dst)
        t = 1_000_000_000 + e * 100
        os.utime(dst, (t, t))
        shutil.rmtree(d, ignore_errors=True)

    walls: list[float] = []

    def timed_ingest(spark_, batch_, state_dir_, batch_id=None, **kw):
        t0 = time.time()
        out = ingest_batch(
            spark_, batch_, state_dir_, batch_id=batch_id, **kw
        )
        walls.append(round(time.time() - t0, 3))
        return out

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t_drain = time.time()
    q = stream_ingest(
        spark,
        stream,
        sdir,
        os.path.join(root, "ckpt"),
        run_id="rung",
        ingest_fn=timed_ingest,
    )
    assert q.awaitTermination(3600), "stream did not drain"
    drain_s = round(time.time() - t_drain, 3)

    # bounded layout: committed dirs never exceed the maintenance
    # threshold plus the live compact tier
    dirs = {
        t: _batch_dirs(os.path.join(sdir, t))
        for t in ("accepted", "fingerprints")
    }
    prov_bytes = max(
        (
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(sdir)
            for f in fs
            if f == "_sources.json"
        ),
        default=0,
    )

    t0 = time.time()
    stream_df = read_accepted(spark, sdir)
    stream_count = stream_df.count()
    stream_sum = stream_df.agg(F.sum("doc_id")).first()[0]
    read_stream_s = round(time.time() - t0, 3)

    # fresh one-shot ingest of the same rows — the batch baseline
    one = os.path.join(root, "oneshot")
    allrows = spark.range(0, per * args.epochs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body "), F.col("id")).alias("text"),
    )
    t0 = time.time()
    ingest_batch(spark, allrows, one, batch_id="all")
    oneshot_ingest_s = round(time.time() - t0, 3)
    t0 = time.time()
    one_df = read_accepted(spark, one)
    one_count = one_df.count()
    one_sum = one_df.agg(F.sum("doc_id")).first()[0]
    read_oneshot_s = round(time.time() - t0, 3)

    n = len(walls)
    quartiles = [
        round(statistics.median(walls[i * n // 4 : (i + 1) * n // 4]), 3)
        for i in range(4)
    ]
    print(
        json.dumps(
            {
                "epochs": n,
                "rows": per * args.epochs,
                "drain_s": drain_s,
                "epoch_wall_quartile_medians": quartiles,
                "epoch_wall_max": max(walls),
                "epoch_walls": walls,
                "dirs": dirs,
                "max_provenance_bytes": prov_bytes,
                "read_stream_s": read_stream_s,
                "read_oneshot_s": read_oneshot_s,
                "corpus_match": (
                    stream_count == one_count and stream_sum == one_sum
                ),
                "survivors": stream_count,
            }
        ),
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
