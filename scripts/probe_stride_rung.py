"""probe_stride rung (r12 verdict task #4): quantify the audio probe
exchange cut and pin recall at each stride.

`dedup_audio`'s probe explode is the repo's largest exchange (r12:
~500 MB at sf1, linear but ~50x the next family). `probe_stride=k`
probes every k-th frame on the probe side only (index side complete);
on the SELF-join shape both sides shuffle, so the expected exchange
scales by (1 + 1/k)/2. This rung runs the full dedup summary at each
stride in its own child JVM (bench.py discipline, UI on), records
wall + shuffle bytes from the REST API, and asserts the SURVIVOR
COUNT + id-sum are identical across strides on the planted corpus —
the recall pin at scale.

Usage:
    python scripts/probe_stride_rung.py [--strides 1,2,4] [sf_dir]
    python scripts/probe_stride_rung.py --one <stride> <sf_dir>   # child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _shuffle_bytes(spark) -> tuple[int, int]:
    url = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{url}/api/v1/applications"))
    stages = json.load(
        urllib.request.urlopen(
            f"{url}/api/v1/applications/{apps[0]['id']}/stages"
        )
    )
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return rd, wr


def run_one(stride: int, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.audio_fp import (
        dedup_audio,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.plans.multimodal import (
        _audio_corpus,
        _read_corpus,
        dedup_audio_head_setup,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
        load_table,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name=f"stride-{stride}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        extra_conf={"spark.ui.enabled": "true"},
    )
    load_table(spark, sf_dir, "region").count()
    dedup_audio_head_setup(spark, sf_dir)  # untimed corpus staging
    rd0, wr0 = _shuffle_bytes(spark)
    t0 = time.time()
    surv = dedup_audio(
        _read_corpus(spark, sf_dir, "audio", _audio_corpus),
        "doc_id",
        "payload",
        probe_stride=stride,
    )
    row = surv.agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").alias("id_sum")
    ).collect()[0]
    dt = round(time.time() - t0, 3)
    rd, wr = _shuffle_bytes(spark)
    print(
        json.dumps(
            {
                "stride": stride,
                "sf_dir": sf_dir,
                "sec": dt,
                "n_kept": row["n_kept"],
                "id_sum": row["id_sum"],
                "shuffle_read_mb": round((rd - rd0) / 1e6, 1),
                "shuffle_write_mb": round((wr - wr0) / 1e6, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 3 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]), sys.argv[3])
        return
    strides = [1, 2, 4]
    args = [a for a in sys.argv[1:] if not a.startswith("--strides")]
    for a in sys.argv[1:]:
        if a.startswith("--strides="):
            strides = [int(x) for x in a.split("=", 1)[1].split(",")]
    sf_dir = args[0] if args else "/tmp/spark_graft_sf1"
    results = []
    for s in strides:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(s), sf_dir],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [
            ln for ln in proc.stdout.splitlines() if ln.startswith('{"stride"')
        ]
        if proc.returncode != 0 or not line:
            print(f"stride {s}: FAILED\n{proc.stderr[-800:]}", file=sys.stderr)
            continue
        rec = json.loads(line[-1])
        results.append(rec)
        print(json.dumps(rec), flush=True)
    kept = {(r["n_kept"], r["id_sum"]) for r in results}
    if len(kept) > 1:
        print(f"SURVIVOR MISMATCH ACROSS STRIDES: {kept}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
