"""Sequence packing for training-batch preparation (§2.12 extension).

Pretraining pipelines do not feed one document per context window —
they CONCATENATE documents in a fixed order and cut the token stream
into fixed-size windows ("concat-then-chunk" packing; padding waste
→ 0 instead of ~50 %). The batch-prep question the pipeline must
answer for every document is: *which windows does it land in, at
what offset?* — that mapping drives the shuffled write of packed
examples.

Distributed shape: a GLOBAL concatenation order would serialize the
corpus through one cumulative sum. Instead the corpus is split into
``n_shards`` deterministic hash shards (same salted-md5 identity as
operators/sampling.py — reproducible across runs and partitionings),
and each shard is packed independently: documents in stable
(bucket-order, doc-id) order, running token offset via one
per-shard window cumsum, window ids by integer division. One keyed
window per shard, all shards in parallel — the same
parallel-prefix shape as ``asof_join_bucketed``. Packing quality is
unaffected (concat-then-chunk wastes at most one partial window per
shard: ≤ n_shards · max_tokens tokens globally, vanishing at corpus
scale).

Every output column is integer arithmetic over the token counts, so
DuckDB replays the whole op bit-for-bit (local oracle in
tests/test_sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.sampling import (
    hash_bucket,
)

#: Default shard count: enough parallelism for any cluster width
#: while keeping per-shard partial-window waste negligible.
DEFAULT_PACK_SHARDS = 1024


def pack_fixed_windows(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    max_tokens: int,
    n_shards: int = DEFAULT_PACK_SHARDS,
    salt: str = "pack",
) -> DataFrame:
    """Assign every document its place in the packed token stream:
    ``(id, shard, offset, start_window, end_window, n_windows)``.

    * ``shard`` — deterministic hash shard packed independently;
    * ``offset`` — the document's first token's position within the
      shard's concatenated stream;
    * ``start_window``/``end_window`` — the fixed-size windows (of
      ``max_tokens`` tokens, numbered per shard) the document's
      tokens fall into; a document with
      ``end_window > start_window`` straddles a boundary and is
      split by the downstream writer (standard pretraining
      behavior);
    * ``n_windows`` — how many windows it touches.

    Deterministic by construction: shard and order depend only on
    document ids, so re-runs, re-partitions and re-ingests produce
    the identical packing — the same reproducibility contract as
    ``hash_split``.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    shard = hash_bucket(F.col(id_col), buckets=n_shards, salt=salt)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = docs.select(
        F.col(id_col),
        shard.alias("shard"),
        F.col(tokens_col).cast("long").alias("_n"),
    ).filter(F.col("_n") > 0)
    offs = staged.withColumn(
        "offset", F.coalesce(F.sum("_n").over(w), F.lit(0).cast("long"))
    )
    b = F.lit(int(max_tokens))
    start_w = F.floor(F.col("offset") / b)
    end_w = F.floor((F.col("offset") + F.col("_n") - 1) / b)
    return offs.select(
        id_col,
        "shard",
        "offset",
        start_w.alias("start_window"),
        end_w.alias("end_window"),
        (end_w - start_w + 1).alias("n_windows"),
    )
