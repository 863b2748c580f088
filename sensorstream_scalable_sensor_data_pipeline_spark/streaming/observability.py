"""Streaming observability: event-time health from query progress
(§2.10 ops tooling).

A watermark silently DROPS data that arrives too late — correct
semantics, but a deployment must SEE it happening: a clock-skewed
sensor feeding 3%-late readings loses 3% of its data with zero
errors anywhere. Structured Streaming already publishes the numbers
(per-trigger ``StreamingQueryProgress``: rows dropped by the
watermark per stateful operator, state rows, input rates); this
module is the thin discipline of capturing and summarizing them.

``drain_with_progress`` is the harness form (bounded availableNow
drain that keeps the progress history the drain helpers discard);
``progress_summary`` folds any progress list — from a drain here or
from a live query's ``recentProgress`` — into the numbers an alert
fires on. No listener threads, no globals: progress objects are
plain dicts the query already retains.
"""

from __future__ import annotations

import itertools
import json
from typing import Any

from pyspark.sql import DataFrame

_mem_counter = itertools.count()


#: Progress entries retained per query. Spark's default cap is 100 —
#: a 150-trigger drain would silently lose the first 50 triggers'
#: late-drop counts from the summary, which defeats the module.
PROGRESS_RETENTION = 10_000


def drain_with_progress(
    sdf: DataFrame, output_mode: str, await_seconds: int = 300
) -> tuple[DataFrame, list[dict]]:
    """drain_to_memory, plus the query's full progress history —
    (result table, [progress dict per trigger]). Memory-sink harness
    path, same caveats as streaming/pipeline.py. The progress
    retention conf is raised for the drain (and restored) so "full"
    means full up to PROGRESS_RETENTION triggers; a drain exceeding
    ``await_seconds`` raises rather than returning partial metrics
    that understate the very losses this module exists to surface."""
    spark = sdf.sparkSession
    conf_key = "spark.sql.streaming.numRecentProgressUpdates"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, str(PROGRESS_RETENTION))
    try:
        name = f"ss_obs_{next(_mem_counter)}"
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(await_seconds)
        if not finished:
            q.stop()
            raise TimeoutError(
                f"drain still running after {await_seconds}s; partial "
                "progress would understate late-drop metrics"
            )
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    return spark.table(name), progress


def progress_summary(progress: list[dict[str, Any]]) -> dict[str, Any]:
    """Fold a progress history into event-time health numbers:

    * ``input_rows`` — total rows entering the query;
    * ``late_rows_dropped`` — rows the watermark discarded (summed
      over every stateful operator and trigger) — THE silent-loss
      number; alert when ``late_fraction`` is nonzero and climbing;
    * ``late_fraction`` — dropped / input (0.0 on empty input);
    * ``max_state_rows`` — peak state-store rows (eviction health:
      unbounded growth means a missing/ineffective watermark bound);
    * ``n_triggers`` — progress entries folded.
    """
    input_rows = 0
    dropped = 0
    max_state = 0
    for p in progress:
        input_rows += int(p.get("numInputRows") or 0)
        for op in p.get("stateOperators") or []:
            dropped += int(op.get("numRowsDroppedByWatermark") or 0)
            max_state = max(max_state, int(op.get("numRowsTotal") or 0))
    return {
        "input_rows": input_rows,
        "late_rows_dropped": dropped,
        "late_fraction": (dropped / input_rows) if input_rows else 0.0,
        "max_state_rows": max_state,
        "n_triggers": len(progress),
    }
