"""Record the streaming funnel's state-store footprint — the design
claim behind streaming/funnel.py (fixed (n−1)·n/2 best-chain block +
watermark-bounded pending buffer per key) as a MEASURED number, from
the engine's own state-operator metrics during a bounded drain.

Usage:
    python scripts/stream_funnel_state_evidence.py [sf_dir]

Prints one JSON line per micro-batch progress event
(numRowsTotal, memoryUsedBytes, bytes/key) and a final summary line.
The curated number lands in COVERAGE.md's streaming-funnel row.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark
    from sensorstream_scalable_sensor_data_pipeline_spark.streaming.funnel import (
        _head_stream,
        stream_funnel,
        stream_funnel_head_setup,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.streaming.pipeline import (
        prepare_session,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="sfunnel-state",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    prepare_session(spark)
    stream_funnel_head_setup(spark, sf_dir)
    out = stream_funnel(
        _head_stream(spark, sf_dir),
        on="user_id",
        time_col="ts",
        type_col="event_type",
        steps=["view", "click", "purchase"],
        watermark="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sfunnel_state_ev")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError(
            "state-evidence drain did not finish within 600s; "
            "partial peak-state numbers discarded"
        )
    peak_rows = peak_bytes = 0
    for p in q.recentProgress:
        for so in p.get("stateOperators", []):
            rows = so.get("numRowsTotal", 0)
            mem = so.get("memoryUsedBytes", 0)
            print(
                json.dumps(
                    {
                        "batch": p.get("batchId"),
                        "state_rows": rows,
                        "state_bytes": mem,
                        "bytes_per_key": round(mem / rows, 1) if rows else None,
                    }
                )
            )
            peak_rows = max(peak_rows, rows)
            peak_bytes = max(peak_bytes, mem)
    n_out = spark.table("sfunnel_state_ev").count()
    print(
        json.dumps(
            {
                "summary": True,
                "sf_dir": sf_dir,
                "peak_state_rows": peak_rows,
                "peak_state_bytes": peak_bytes,
                "peak_bytes_per_key": round(peak_bytes / peak_rows, 1)
                if peak_rows
                else None,
                "chains_emitted": n_out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
