"""Multimodal (binary) column plumbing (SURVEY §2.12).

Model: image/audio/video payloads are opaque ``binary`` columns with
typed metadata columns alongside. The *plumbing* — schemas, metadata
extraction, Arrow-batched Pandas processing over ``mapInPandas``,
partitioning behavior — is real and tested; the actual codec step is
stubbed (this container ships no image/audio libraries) behind
``decode_image``, which raises ``NotImplementedError`` unless the
deterministic fake decoder is requested.

Scale notes: metadata extraction (length/md5/magic) is pure codegen
column math — runs at scan speed, and because the metadata lives in
its own parquet columns, filters on it prune *without touching the
payload bytes* (column pruning is what makes 100 TB of blobs
queryable). The Pandas stage is Arrow-batched ``mapInPandas`` — one
python worker per partition processing whole record batches, never
row-at-a-time; keep payload partitions ≲128 MB via
``spark.sql.files.maxPartitionBytes`` so a batch of blobs fits worker
memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

#: Bytes-per-frame for the deterministic fake video framer.
_FAKE_FRAME_BYTES = 256


def binary_with_metadata(df: DataFrame, binary_col: str) -> DataFrame:
    """Attach typed metadata columns to an opaque binary payload:
    byte length, content md5, and the hex "magic number" prefix (the
    standard format-sniffing key — e.g. ffd8 for JPEG)."""
    b = F.col(binary_col)
    return (
        df.withColumn("n_bytes", F.length(b).cast("long"))
        .withColumn("content_md5", F.md5(b))
        .withColumn("magic_hex", F.lower(F.hex(F.substring(b, 1, 4))))
    )


def decode_image(payload: bytes, *, fake: bool = False) -> dict:
    """Decode an image payload into features.

    STUB: the real implementation needs an image codec (PIL/opencv —
    not in this container). ``fake=True`` returns deterministic
    pseudo-features derived from the raw bytes so the full Spark
    plumbing (schema, batching, partitioning) is exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image codec library; "
            "run with fake=True for the deterministic stub"
        )
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    n = int(arr.size)
    return {
        "n_bytes": n,
        "byte_sum": int(arr.sum(dtype=np.int64)),
        "byte_mean": (float(arr.sum(dtype=np.int64)) / n) if n else 0.0,
        "n_frames": n // _FAKE_FRAME_BYTES,
    }


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("n_frames", LongType()),
    ]
)


def extract_features(
    df: DataFrame, id_col: str, binary_col: str, fake_decoder: bool = True
) -> DataFrame:
    """Feature-extract binary payloads via Arrow-batched
    ``mapInPandas``. Each python worker receives whole Arrow record
    batches; the per-payload decode is the only Python loop, which is
    exactly the part that is genuinely non-vectorizable (codec calls).
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                decode_image(p, fake=fake_decoder) for p in pdf[binary_col]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].astype("int64").to_numpy())
            yield out

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


# ------------------------------------------------- resize / frame-sample


def resize_image(payload: bytes, target_bytes: int, *, fake: bool = False) -> bytes:
    """Resize an image payload.

    STUB: a real resize needs a codec (decode → scale → re-encode).
    ``fake=True`` is a deterministic strided byte subsample to exactly
    ``target_bytes`` (or the payload itself when already smaller) so
    the Spark plumbing — binary in, smaller binary out, schema and
    batch shapes — is exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image resizing requires an image codec library; "
            "run with fake=True for the deterministic stub"
        )
    if len(payload) <= target_bytes:
        return payload
    stride = len(payload) / target_bytes
    return bytes(payload[int(i * stride)] for i in range(target_bytes))


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_payloads(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    target_bytes: int,
    fake_codec: bool = True,
) -> DataFrame:
    """Batch-resize binary payloads via Arrow-batched ``mapInPandas``
    (the thumbnail/downscale stage of a multimodal training pipeline).
    Output payloads are capped at ``target_bytes`` each — the
    downstream shuffle/storage win is the whole point: resize BEFORE
    any shuffle so the wide bytes never move at full size."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "payload": [
                        resize_image(p, target_bytes, fake=fake_codec)
                        for p in pdf[binary_col]
                    ],
                }
            )
            out.insert(1, "n_bytes", out["payload"].map(len).astype("int64"))
            yield out

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    every_n: int = 4,
    fake_codec: bool = True,
) -> DataFrame:
    """Sample every ``every_n``-th frame from video payloads — the
    fan-OUT multimodal stage (one row in, many frame rows out), which
    is exactly what ``mapInPandas`` models: a batch iterator may yield
    more rows than it receives, keeping the expansion executor-side
    (the exploded frames never pass through the driver and partition
    like any other relation).

    STUB: real frame extraction needs a video codec; the deterministic
    fake treats the payload as fixed-size frames of
    ``_FAKE_FRAME_BYTES`` (the same framing ``decode_image``'s
    ``n_frames`` reports, so the two stubs agree)."""
    if every_n <= 0:
        raise ValueError("every_n must be positive")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(
                pdf[id_col].astype("int64"), pdf[binary_col]
            ):
                if not fake_codec:
                    raise NotImplementedError(
                        "frame extraction requires a video codec library; "
                        "run with fake_codec=True for the deterministic stub"
                    )
                n_frames = len(payload) // _FAKE_FRAME_BYTES
                for fi in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(
                        payload[
                            fi * _FAKE_FRAME_BYTES : (fi + 1) * _FAKE_FRAME_BYTES
                        ]
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        run, schema=FRAME_SCHEMA
    )
