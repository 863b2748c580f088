"""Per-stage attribution for the decode-dominated modality rungs.

r11 verdict task carried to r12 ("attribute before it becomes
baseline"): the stored-corpus rungs read SUPER-linear at 10× data —
`dedup_video` 5.1×, `curate_image_corpus` 4.9×, `dedup_audio` 3.8× —
while their shuffles are flat/tiny and payloads provably never move,
so the slope must live in the scan. A linear scan should amortize the
fixed floor and read SUB-linear; this harness decomposes each rung
into its pipeline stages in ONE session per (family, scale) — the
same playbook that found the pHash pigeonhole wall in r11 — and tags
every stage with the Spark REST deltas (executor run/CPU time, GC,
input + shuffle bytes, task count) so the super-linear term gets a
NAME (python-worker batch boundaries vs GC vs decode CPU vs
under-parallel input splits).

Usage:
    python scripts/profile_modality_rungs.py <family> <sf_dir>
    # family in {video, image, audio}; prints one JSON line per stage

Parent sweep (children, cold JVM per point — bench discipline):
    python scripts/profile_modality_rungs.py --sweep [families...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1"

_METRIC_KEYS = (
    "executorRunTime",
    "executorCpuTime",
    "jvmGcTime",
    "inputBytes",
    "shuffleReadBytes",
    "shuffleWriteBytes",
    "memoryBytesSpilled",
    "diskBytesSpilled",
    "numCompleteTasks",
)


def _stage_totals(spark) -> dict:
    url = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{url}/api/v1/applications"))
    stages = json.load(
        urllib.request.urlopen(
            f"{url}/api/v1/applications/{apps[0]['id']}/stages"
        )
    )
    out = dict.fromkeys(_METRIC_KEYS, 0)
    for s in stages:
        for k in _METRIC_KEYS:
            out[k] += s.get(k, 0) or 0
    return out


class Prof:
    def __init__(self, spark, family: str, sf_dir: str):
        self.spark, self.family, self.sf_dir = spark, family, sf_dir
        self.base = _stage_totals(spark)

    def stage(self, name: str, fn):
        t0 = time.time()
        result = fn()
        dt = time.time() - t0
        now = _stage_totals(self.spark)
        delta = {k: now[k] - self.base[k] for k in _METRIC_KEYS}
        self.base = now
        # executorCpuTime is ns; run/GC are ms. A python-bound stage
        # shows run_s >> cpu_s (the JVM thread blocks on the worker).
        print(
            json.dumps(
                {
                    "family": self.family,
                    "sf_dir": self.sf_dir,
                    "stage": name,
                    "sec": round(dt, 2),
                    "result": result,
                    "exec_run_s": round(delta["executorRunTime"] / 1e3, 1),
                    "exec_cpu_s": round(delta["executorCpuTime"] / 1e9, 1),
                    "gc_s": round(delta["jvmGcTime"] / 1e3, 1),
                    "input_mb": round(delta["inputBytes"] / 1e6, 1),
                    "shuf_r_mb": round(delta["shuffleReadBytes"] / 1e6, 1),
                    "shuf_w_mb": round(delta["shuffleWriteBytes"] / 1e6, 1),
                    "spill_mb": round(
                        (delta["memoryBytesSpilled"] + delta["diskBytesSpilled"])
                        / 1e6,
                        1,
                    ),
                    "tasks": delta["numCompleteTasks"],
                }
            ),
            flush=True,
        )
        return result


def _corpus(spark, sf_dir: str, tag: str):
    from sensorstream_scalable_sensor_data_pipeline_spark.plans import multimodal as mm

    builders = {
        "images": mm._image_corpus,
        "audio": mm._audio_corpus,
        "video": mm._video_corpus,
    }
    mm._ensure_corpus(spark, sf_dir, tag, builders[tag])
    return mm._read_corpus(spark, sf_dir, tag, builders[tag])


def profile_video(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_fuzzy import (
        drop_near_duplicates,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.video_dedup import (
        video_candidates,
        with_frame_phashes,
    )

    # corpus staging FIRST: on an unstaged sf_dir _ensure_corpus runs
    # the full synth+encode+write job, and a Prof baseline captured
    # before it would mis-attribute those jobs to the first profiled
    # stage (review-found)
    corpus = _corpus(spark, sf_dir, "video")
    p = Prof(spark, "video", sf_dir)
    p.stage(
        "payload_scan_only",
        lambda: corpus.agg(F.sum(F.length("payload"))).collect()[0][0],
    )
    p.stage("input_splits", lambda: corpus.rdd.getNumPartitions())
    fh = with_frame_phashes(corpus, "doc_id", "payload", every_n=2).persist()
    p.stage("decode_hash_scan", lambda: fh.count())
    pairs = video_candidates(fh, "doc_id")
    p.stage("candidates_vote", lambda: pairs.count())
    p.stage(
        "closure_antijoin",
        lambda: drop_near_duplicates(
            corpus, pairs, id_col="doc_id", broadcast_losers=True
        )
        .agg(F.count(F.lit(1)), F.sum(F.length("payload")))
        .collect()[0][0],
    )
    fh.unpersist()


def profile_image(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_fuzzy import (
        drop_near_duplicates,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.phash import (
        auto_banded_params,
        choose_phash_method,
        phash_candidates,
        phash_candidates_banded,
        with_phash,
    )

    corpus = _corpus(spark, sf_dir, "images")  # stage before baselining
    p = Prof(spark, "image", sf_dir)
    p.stage(
        "payload_scan_only",
        lambda: corpus.agg(F.sum(F.length("payload"))).collect()[0][0],
    )
    p.stage("input_splits", lambda: corpus.rdd.getNumPartitions())
    hashes = with_phash(corpus, "doc_id", "payload").persist()
    n = p.stage("decode_hash_scan", lambda: hashes.count())
    resolved = choose_phash_method(n, 8)
    p.stage("auto_method", lambda: resolved)
    if resolved == "pigeonhole":
        cand = phash_candidates(hashes, "doc_id", max_hamming=8)
    else:
        bands, bits = auto_banded_params(n, 8)
        cand = phash_candidates_banded(
            hashes, "doc_id", bands=bands, bits_per_band=bits
        )
    pairs = cand.filter(F.col("hamming") <= 8)
    p.stage("candidates", lambda: pairs.count())
    p.stage(
        "closure_antijoin",
        lambda: drop_near_duplicates(
            corpus, pairs, id_col="doc_id", broadcast_losers=True
        )
        .agg(F.count(F.lit(1)), F.sum(F.length("payload")))
        .collect()[0][0],
    )
    hashes.unpersist()


def profile_audio(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.audio_fp import (
        audio_candidates,
        with_audio_fingerprint,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_fuzzy import (
        drop_near_duplicates,
    )

    corpus = _corpus(spark, sf_dir, "audio")  # stage before baselining
    p = Prof(spark, "audio", sf_dir)
    p.stage(
        "payload_scan_only",
        lambda: corpus.agg(F.sum(F.length("payload"))).collect()[0][0],
    )
    p.stage("input_splits", lambda: corpus.rdd.getNumPartitions())
    fps = with_audio_fingerprint(corpus, "doc_id", "payload").persist()
    p.stage("fft_fingerprint_scan", lambda: fps.count())
    pairs = audio_candidates(fps, "doc_id")
    p.stage("probe_vote_ber", lambda: pairs.count())
    p.stage(
        "closure_antijoin",
        lambda: drop_near_duplicates(
            corpus, pairs, id_col="doc_id", broadcast_losers=True
        )
        .agg(F.count(F.lit(1)), F.sum(F.length("payload")))
        .collect()[0][0],
    )
    fps.unpersist()


FAMILIES = {"video": profile_video, "image": profile_image, "audio": profile_audio}


def main() -> None:
    if sys.argv[1:2] == ["--sweep"]:
        fams = sys.argv[2:] or list(FAMILIES)
        for fam in fams:
            for sf_dir in (SRC, SF1):
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__), fam, sf_dir],
                    timeout=3600,
                )
        return
    family, sf_dir = sys.argv[1], sys.argv[2]
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name=f"profile-{family}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        extra_conf={"spark.ui.enabled": "true"},
    )
    FAMILIES[family](spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
