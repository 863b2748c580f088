"""Incremental exact dedup against persisted fingerprint state
(§2.12 × the reference's incremental-ingest design).

A training corpus is not built in one shot: batches land daily and
each batch must be deduplicated against EVERYTHING already accepted
— the incremental generalization of ``dedup_exact``, exactly the way
the reference's cutoff/dedup pair (main_pipeline.py:328,331-341)
generalizes to content identity. The state is a parquet table of
accepted content fingerprints, partitioned by a hash prefix:

* ``ingest_batch``: fingerprint the batch (md5 of normalized
  tokens — the same identity ``dedup_exact`` uses), drop
  within-batch duplicates (min-id survivor), LEFT ANTI join against
  the state table to drop anything history already holds, then
  append the survivors' fingerprints to the state.
* State layout ``partitionBy(fp_prefix)`` (first hex digit, 16
  dirs): the anti-join shuffles both sides by fingerprint; the
  prefix partitioning keeps state files bounded and lets a
  prefix-bucketed reader co-locate. The state table carries ONE row
  per accepted document (fingerprint + doc_id), orders smaller than
  the corpus text.

Idempotency: re-ingesting a batch that was already accepted yields
zero new documents (every fingerprint anti-joins away) and appends
nothing — the property the tests pin, alongside two-batch ≡ one-shot
equivalence.

Scale notes: the anti-join is one keyed shuffle on a uniform 128-bit
key (never all-pairs); at 100 TB the state side is the small one by
construction. Appends are atomic at the file level (parquet append of
new part-files); a failed run before the append leaves state
unchanged — re-run safe. Concurrent ingests should serialize through
the run lock (schedule.py), same as the reference's
``max_active_runs=1``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup import (
    key_dedup_deterministic,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.text import (
    tokenize_lower,
)


def fingerprint_docs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fp, fp_prefix): md5 of whitespace-normalized lowercase
    text — the ``dedup_exact`` content identity — plus the 1-hex-digit
    state partition key."""
    staged = docs.select(
        F.col(id_col), tokenize_lower(F.col(text_col)).alias("_tk")
    )
    fp = F.md5(F.concat_ws(" ", F.col("_tk")))
    return staged.select(
        F.col(id_col), fp.alias("fp"), F.substring(fp, 1, 1).alias("fp_prefix")
    )


def read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The accepted-fingerprint table, or None before the first
    ingest."""
    path = os.path.join(state_dir, "fingerprints")
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deduplicate ``batch`` within itself and against all previously
    accepted content, persist the survivors' fingerprints, and return
    the surviving rows (all original columns). Min-id survivor within
    a batch; history always wins across batches."""
    fps = fingerprint_docs(batch, id_col, text_col)
    within = key_dedup_deterministic(fps, ["fp"], id_col, keep="min")
    state = read_state(spark, state_dir)
    if state is not None:
        fresh = within.join(state.select("fp"), "fp", "left_anti")
    else:
        fresh = within
    # Materialize the survivor set BEFORE appending state: the append
    # must not re-trigger (and re-randomize) upstream computation, and
    # the returned frame must not observe the state rows it just
    # wrote. Survivor fingerprints are one row per accepted doc.
    fresh = fresh.localCheckpoint(eager=True)
    fresh.select("fp", "fp_prefix", F.col(id_col)).write.mode("append").partitionBy(
        "fp_prefix"
    ).parquet(os.path.join(state_dir, "fingerprints"))
    return batch.join(fresh.select(F.col(id_col)), id_col)
