"""One-partition driver-built DataFrames (r16 optimization round).

``spark.createDataFrame(<python list>, schema)`` splits the list into
``defaultParallelism`` Python-RDD slices, so on a 32-core session the
consuming action schedules 32 tasks that each launch (or queue on) a
Python worker just to unpickle a handful of rows. Worker creation is
serialized process-wide on the SparkEnv monitor, so these scans are
disproportionately expensive exactly when they run inside a larger
action: REST thread dumps during ``dedup_audio``'s final collect
showed a 48 task-second near-zero-CPU stage whose tasks were blocked
on ``createPythonWorker`` — scanning the ~hundreds-row union-find
closure result (guide §7.3 methodology, §4 the-Python-boundary).

``tiny_local_frame`` keeps the exact same data/schema semantics but
parallelizes the rows into ONE slice: one task, one Python worker,
identical rows. Use it for every k-sized / summary-sized local frame
(closure labels, centroid seeds, 1-row asserted summaries). NOT for
anything that should scale with the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def tiny_local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` pinned to one slice.

    Empty inputs keep the plain list path (no RDD job shape change for
    a zero-row frame); non-empty inputs go through
    ``parallelize(rows, 1)`` so the scan is a single Python task. Row
    values and schema handling are unchanged — the list path's eager
    driver-side type verification is traded for the RDD path's
    execution-time verification, identical for the internally-built
    well-typed rows these call sites pass.
    """
    rows = rows if isinstance(rows, list) else list(rows)
    sc = getattr(spark, "sparkContext", None)
    if not rows or sc is None:
        # empty frame (no job shape to pin), or a stub session without
        # a context (the pure-unit property tests drive closure code
        # through a fake that only records createDataFrame calls)
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(sc.parallelize(rows, 1), schema)
