"""Multimodal-column queries (SURVEY §2.12) — ``documents.text``
re-encoded as an opaque binary payload plays the image/audio blob
role (the container has no media testdata; the bytes are real, the
codec is the documented stub in operators/multimodal.py).

``mm_binary_metadata`` is pure codegen column math and fully
oracle-checked. ``mm_feature_extract`` exercises the Arrow-batched
``mapInPandas`` path; its byte statistics are oracle-checked too —
the corpus is pure ASCII (verified), so DuckDB can recompute byte
sums as codepoint sums without a blob-iteration primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.multimodal import (
    binary_with_metadata,
    extract_features,
)
from sensorstream_scalable_sensor_data_pipeline_spark.plans.registry import query
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table


def _with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id"), F.encode(F.col("text"), "UTF-8").alias("payload")
    )


@query(
    "mm_binary_metadata",
    oracle=r"""
    SELECT doc_id,
           octet_length(text::BLOB) AS n_bytes,
           md5(text) AS content_md5,
           lower(substr(hex(text::BLOB), 1, 8)) AS magic_hex
    FROM documents
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: length, content
    md5, magic-number prefix. Scan-speed column math; storing these
    beside the payload is what lets format/size filters prune 100 TB
    of blobs without reading payload bytes."""
    return binary_with_metadata(_with_payload(spark, sf_dir), "payload").select(
        "doc_id", "n_bytes", "content_md5", "magic_hex"
    )


@query(
    "mm_feature_extract",
    oracle=r"""
    SELECT doc_id,
           octet_length(text::BLOB) AS n_bytes,
           list_sum(list_transform(generate_series(1, length(text)),
                                   i -> ascii(substr(text, i, 1))))::BIGINT AS byte_sum,
           CAST(list_sum(list_transform(generate_series(1, length(text)),
                                        i -> ascii(substr(text, i, 1)))) AS DOUBLE)
             / octet_length(text::BLOB) AS byte_mean,
           (octet_length(text::BLOB) // 256)::BIGINT AS n_frames
    FROM documents
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched ``mapInPandas`` feature extraction over binary
    payloads (the deterministic fake decoder — the real codec is the
    documented NotImplementedError stub). The oracle recomputes the
    byte statistics SQL-side, valid because the corpus is pure ASCII
    (bytes ≡ codepoints); ``byte_mean`` is one int-ratio divide,
    identical IEEE in both engines."""
    return extract_features(
        _with_payload(spark, sf_dir), "doc_id", "payload", fake_decoder=True
    )
