"""Per-stage attribution for ANY bench head (optimization-round tool).

Runs one head exactly the way ``bench.py --one`` does (same session
factory, same warmup, same untimed setup hook, same collect()
materialization) but with the Spark UI enabled, then dumps every
stage's REST metrics sorted by executor run time — the guide-§1
"empirical" loop (find where the time actually goes) without
eyeballing a live UI the sandbox cannot open.

Usage:
    python scripts/profile_head.py <head> [sf_dir]

Prints one JSON line per stage: name, task count, executorRunTime,
executorCpuTime, input/shuffle bytes, plus a total line. Wall/cpu of
the timed region match bench.py's definition so numbers line up with
BENCH_r{N} medians.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else bench.SF_DIR
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-{name}",
        master=f"local[{bench.CPUS}]",
        shuffle_partitions=max(bench.CPUS, 32),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4047"},
    )
    fn, setup = bench._resolve_head(name)
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
        load_table,
    )

    load_table(spark, sf_dir, "region").count()
    bench._python_warmup(spark)
    if name.startswith("stream_"):
        bench._stream_warmup(spark)
    if setup is not None:
        setup(spark, sf_dir)

    # stages before this id are warmup/setup — excluded
    ui = "http://localhost:4047/api/v1"
    app = json.load(urllib.request.urlopen(f"{ui}/applications"))[0]["id"]

    def stages():
        return json.load(
            urllib.request.urlopen(f"{ui}/applications/{app}/stages?status=complete")
        )

    pre_ids = {s["stageId"] for s in stages()}

    t0 = time.time()
    cpu0 = bench._tree_cpu_seconds()
    df = fn(spark, sf_dir)
    rows = len(df.collect())
    dt = round(time.time() - t0, 3)
    cpu_s = round(bench._tree_cpu_seconds() - cpu0, 3)

    rec = []
    for s in stages():
        if s["stageId"] in pre_ids:
            continue
        rec.append(
            {
                "stage": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "run_s": round(s["executorRunTime"] / 1e3, 2),
                "cpu_s": round(s["executorCpuTime"] / 1e9, 2),
                "in_mb": round(s["inputBytes"] / 1e6, 1),
                "sh_r_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                "sh_w_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                "name": s["name"].split("\n")[0][:90],
            }
        )
    rec.sort(key=lambda r: -r["run_s"])
    for r in rec[:25]:
        print(json.dumps(r))
    print(
        json.dumps(
            {"head": name, "wall_s": dt, "tree_cpu_s": cpu_s, "rows": rows,
             "n_stages": len(rec)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
