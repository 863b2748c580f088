"""Streaming SCD2 dimension maintenance (§2.10 × sources/merge.py):
a change stream keeps a full-history dimension table current.

The batch half (sources/merge.py::scd2_apply) answers "apply this
batch of attribute changes"; deployments get those changes as a
STREAM (CDC feed, state events). This module runs the same pure
transform inside a checkpointed ``foreachBatch``: each micro-batch is
pre-collapsed to its latest row per key, applied to the current
dimension, and the new dimension swapped in atomically (staging dir +
rename — the runner.py crash protocol, so a failure mid-write leaves
the previous dimension intact and the checkpoint replays the batch).

IDEMPOTENCY, the at-least-once requirement: ``scd2_apply`` is a
fixpoint under replay BY CONSTRUCTION — a replayed batch's updates
are now the dimension's current rows, the NULL-safe change detection
sees identical attributes, and every branch lands in "unchanged"
(pinned by applying the same batch twice and hashing the dimension).
No batch-id bookkeeping needed; algebraic idempotency beats marker
files.

Rewrite cost: each batch rewrites the dimension — dimensions are
key-cardinality-sized (thousands-millions of rows), orders below the
fact stream, and the full-history table IS the product. A dimension
too large for that moves to ``merge_upsert`` on a partition column of
the key domain; the transform is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.sources.merge import (
    scd2_apply,
    scd2_init,
)


def latest_per_key(
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_col: str,
) -> DataFrame:
    """Collapse a batch to ONE row per key — the newest by
    (effective, attrs struct): scd2_apply's single-row-per-key
    contract, enforced deterministically (an effective-instant tie
    resolves by the full attr struct, never arrival order)."""
    pick = F.max_by(
        F.struct(*attr_cols, effective_col),
        F.struct(F.col(effective_col), F.struct(*attr_cols)),
    ).alias("_p")
    return (
        updates.groupBy(*key_cols)
        .agg(pick)
        .select(
            *key_cols,
            *[F.col("_p")[c].alias(c) for c in attr_cols],
            F.col("_p")[effective_col].alias(effective_col),
        )
    )


def apply_scd2_batch(
    spark: SparkSession,
    dim_dir: str,
    batch: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_col: str,
) -> None:
    """One batch against the durable dimension: read (or bootstrap),
    apply, atomic-swap. Exposed for tests and for batch backfills —
    the streaming sink below is just this per micro-batch."""
    collapsed = latest_per_key(batch, key_cols, attr_cols, effective_col)
    if os.path.exists(dim_dir):
        dim = spark.read.parquet(dim_dir)
        updated = scd2_apply(dim, collapsed, key_cols, attr_cols, effective_col)
    else:
        updated = scd2_init(collapsed, key_cols, attr_cols, effective_col)
    staging = dim_dir.rstrip("/") + "_staging"
    updated.write.mode("overwrite").parquet(staging)
    old = dim_dir.rstrip("/") + "_old"
    import shutil

    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(dim_dir):
        os.rename(dim_dir, old)
    os.rename(staging, dim_dir)
    shutil.rmtree(old, ignore_errors=True)


def stream_scd2_maintain(
    spark: SparkSession,
    changes: DataFrame,
    dim_dir: str,
    key_cols: list[str],
    attr_cols: list[str],
    effective_col: str,
    checkpoint: str,
    await_seconds: int = 300,
) -> DataFrame:
    """Drain a bounded change stream into the dimension at
    ``dim_dir`` (availableNow; production drops the trigger for a
    continuous feed) and return the resulting dimension. Batches
    arrive through the checkpointed ``foreachBatch`` sink; every
    batch is one :func:`apply_scd2_batch`."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_scd2_batch(
            spark, dim_dir, batch_df, key_cols, attr_cols, effective_col
        )

    q = (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(await_seconds)
    return spark.read.parquet(dim_dir)
