"""broadcast_ids escape rung (r15, r14 verdict task #6): measure the
`broadcast_ids=False` plain anti-join against the default broadcast
anti-join at two contamination rates, on the image decontaminator.

The r14 knob exists because a pathological contamination rate makes
the contaminated-ID set corpus-sized — past what the driver can
broadcast — and the plain anti-join degrades to an AQE-planned
shuffle instead of an OOM. It was plan-pinned but never MEASURED
where it matters. This rung runs `decontaminate_images` in both modes
at two contamination rates in child JVMs (bench.py discipline, UI on
for the REST shuffle counters), records wall + shuffle bytes + the
survivor count, and asserts the two modes keep IDENTICAL survivors.

Contamination model: the eval set is every doc whose id falls in the
contaminated stride, re-identified under +10^7 ids (identity payloads
— exact duplicates are near-duplicates at any radius, so the
contaminated set is exactly the strided subset, closed-form).

Usage:
    python scripts/decontam_broadcast_rung.py [sf_dir]
    python scripts/decontam_broadcast_rung.py --one <mode> <pct> <sf_dir>
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


def run_one(mode: str, pct: int, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.phash import (
        decontaminate_images,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.plans.multimodal import (
        _image_corpus,
        _read_corpus,
        dedup_phash_head_setup,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
        load_table,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name=f"decontam-{mode}-{pct}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        extra_conf={"spark.ui.enabled": "true"},
    )
    load_table(spark, sf_dir, "region").count()
    dedup_phash_head_setup(spark, sf_dir)  # untimed corpus staging
    corpus = _read_corpus(spark, sf_dir, "images", _image_corpus)
    # contaminated stride: pct% of corpus ids, re-identified as evals
    stride = 100 // pct
    evals = corpus.filter(F.col("doc_id") % stride == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "payload"
    )
    rd0, wr0 = _shuffle_bytes(spark)
    t0 = time.time()
    clean = decontaminate_images(
        corpus, evals, "doc_id", "payload",
        broadcast_ids=(mode == "broadcast"),
    )
    row = clean.agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").alias("id_sum")
    ).collect()[0]
    dt = round(time.time() - t0, 3)
    rd, wr = _shuffle_bytes(spark)
    print(
        json.dumps(
            {
                "mode": mode,
                "contam_pct": pct,
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
    if len(sys.argv) > 4 and sys.argv[1] == "--one":
        run_one(sys.argv[2], int(sys.argv[3]), sys.argv[4])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    results: dict[int, dict[str, dict]] = {}
    for pct in (10, 50):
        for mode in ("broadcast", "plain"):
            proc = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--one", mode, str(pct), sf_dir,
                ],
                capture_output=True,
                text=True,
                timeout=3600,
            )
            line = [
                ln for ln in proc.stdout.splitlines()
                if ln.startswith('{"mode"')
            ]
            if proc.returncode != 0 or not line:
                print(
                    f"{mode}/{pct}%: FAILED\n{proc.stderr[-800:]}",
                    file=sys.stderr,
                )
                continue
            rec = json.loads(line[-1])
            results.setdefault(pct, {})[mode] = rec
            print(json.dumps(rec), flush=True)
    bad = [
        pct
        for pct, by_mode in results.items()
        if len(
            {(r["n_kept"], r["id_sum"]) for r in by_mode.values()}
        ) > 1
    ]
    if bad:
        print(f"SURVIVOR MISMATCH ACROSS MODES at {bad}%", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
