"""Sized parquet sinks (S5, S6, S9, X4) and partitioned layout (W1 emit).

The reference writes one parquet dataset per sensor with
``repartition(count // 100000)`` + ``maxRecordsPerFile=100000``
(main_pipeline.py:222-230). The extra ``count()`` job per write is
wasteful (SURVEY §4 X4): ``maxRecordsPerFile`` alone caps file size,
and AQE coalescing right-sizes the partition count from runtime
statistics. At 100 TB the count-then-repartition pattern would add a
full scan per sink — we drop it.

``write_partitioned`` replaces the reference's per-sensor Python loop
(main_pipeline.py:305-329, one filtered job per sensor — O(sensors)
jobs) with a single ``partitionBy(key)`` job: one shuffle-free write
that lays out ``key=.../part-*.parquet`` directories, with Catalyst
partition pruning on read-back (X9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_MAX_RECORDS_PER_FILE = 100_000  # main_pipeline.py:226-229

WRITE_MODES = ("overwrite", "append")  # S6, main_pipeline.py:228


def write_sized_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> None:
    """S5/X4: parquet sink with bounded file sizes, no pre-count job."""
    if mode not in WRITE_MODES:
        raise ValueError(f"write mode must be one of {WRITE_MODES}, got {mode!r}")
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    dynamic_partition_overwrite: bool = False,
) -> None:
    """Single-job per-key layout replacing the reference's N-writes loop
    (W1). Partition columns become directories; readers get static +
    dynamic partition pruning for free. With
    ``dynamic_partition_overwrite`` an overwrite replaces ONLY the
    partitions present in ``df`` — the scalable merge primitive: a
    30-day merge rewrites 30 days of partitions, never the table."""
    if mode not in WRITE_MODES:
        raise ValueError(f"write mode must be one of {WRITE_MODES}, got {mode!r}")
    w = df.write.mode(mode).option("maxRecordsPerFile", str(max_records_per_file))
    if dynamic_partition_overwrite:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.partitionBy(*partition_cols).parquet(path)


def validate_output(spark: SparkSession, path: str) -> int:
    """S9: post-write existence check (Airflow Dags.docx
    ``validate_output`` lists the S3 prefix and fails if empty) —
    re-expressed as a read-back count, which also validates footer
    integrity, not just object existence."""
    n = spark.read.parquet(path).count()
    if n == 0:
        raise RuntimeError(f"output validation failed: {path} is empty")
    return n


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (SURVEY §4 scale tooling): pre-shuffle
    the data ONCE at write time into ``n_buckets`` hash buckets on
    the join/agg key, so every later equi-join or aggregation on that
    key between co-bucketed tables runs with ZERO exchange — the
    write amortizes the shuffle across all future queries, the
    standard warehouse move for a fact table joined daily on the same
    key (plan-pinned: tests assert the bucketed self-join has no
    Exchange).

    Bucketing requires the session catalog (``saveAsTable``); plain
    ``.parquet(path)`` cannot record bucket metadata. Pick
    ``n_buckets`` ≈ cluster cores at the TARGET scale — too few
    buckets caps join parallelism forever; with ``sort_col`` the
    buckets are also sort-merged-ready without a sort stage.
    """
    if mode not in WRITE_MODES:
        raise ValueError(f"write mode must be one of {WRITE_MODES}, got {mode!r}")
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
