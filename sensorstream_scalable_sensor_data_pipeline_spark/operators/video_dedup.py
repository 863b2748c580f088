"""Near-duplicate VIDEO dedup — frame-sampled perceptual hashing.

The last modality of the dedup family (text / images / audio / now
video): detect clips that are the SAME footage re-encoded (DIB ↔
MJPEG, quality changes) or trimmed, even though they share no bytes.
This is a COMPOSITION, not new machinery — exactly the layering the
module split was designed for:

1. frame sampling: decode every ``every_n``-th frame executor-side
   (the repo AVI codec — operators/codecs.py::decode_avi_frames,
   DIB + MJPEG);
2. per-frame :func:`~...phash.phash64_pixels` (operators/phash.py);
3. matching on the audio-fingerprint template
   (operators/audio_fp.py): candidate pairs from a blocked equi-join
   on frame hashes + a most-common-FRAME-OFFSET vote, then the
   verdict is the fraction of the shorter clip's sampled frames
   matching at that single offset (offset consistency is what
   separates true re-encodes from one coincidentally similar frame —
   e.g. two clips sharing a black frame).

Frame matching is EXACT on the 64-bit pHash by default: a re-encode
perturbs a frame's hash by ≤ a few bits, and across tens of sampled
frames enough land bit-exact to dominate the vote (same argument as
the audio probe); ``max_hamming > 0`` switches the frame join to the
pigeonhole blocks for noisier transforms, with the same quadratic-
bucket caveat documented in operators/phash.py.

Scale shape: decode+hash is an Arrow ``mapInPandas`` scan (frames
never leave the executor as pixels — only 8-byte hashes shuffle);
the join is keyed on the hash value; the vote is one groupBy; the
closure/anti-join are the shared dedup machinery. At 100 TB of video
the payload bytes cross the wire exactly once (the scan).

Reference tie: SURVEY §2.12 multimodal scope; the reference pipeline
has no video stage (main_pipeline.py:1-369).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_fuzzy import (
    blocked_hamming_matches,
    drop_near_duplicates,
    vote_best_offset,
)

#: Grayscale peak-to-peak below which a frame counts as DEGENERATE
#: (constant/near-constant — fades, title cards, black/white frames).
#: Such frames are ubiquitous in real footage, offset-CONSISTENT
#: across unrelated clips, and hub the frame-hash equi-join
#: quadratically (the same hub reasoning as audio_fp's silence words
#: and text LSH's stopwords). Detection happens at HASH time by pixel
#: variance, not by hash value: a constant frame's pHash is NOT a
#: fixed sentinel — sub-median DCT float noise makes constant 128 /
#: 255 frames hash to arbitrary stable values (measured:
#: -7698788288617737321 / -2350834392976878697), so value-matching
#: only ever caught black. The margin absorbs codec noise: a q85
#: MJPEG re-encode of a constant frame reconstructs within ±2 levels.
_DEGENERATE_PTP = 4.0

FRAME_HASH_SCHEMA = "doc_id long, frame_idx long, phash long"


def with_frame_phashes(
    df: DataFrame, id_col: str, binary_col: str, every_n: int = 4
) -> DataFrame:
    """(id, avi payload) → (doc_id, frame_idx, phash): decode every
    ``every_n``-th frame and pHash it, all inside one Arrow
    ``mapInPandas`` pass — pixels never leave the executor.
    Degenerate (near-constant) frames emit a NULL hash: the row still
    counts toward the clip's frame total (the match_frac denominator
    must stay the FULL sampled count so mostly-constant clips can't
    qualify on their few live frames), but NULL never joins."""
    if every_n <= 0:
        raise ValueError("every_n must be positive")

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
            decode_avi_frames,
        )
        from sensorstream_scalable_sensor_data_pipeline_spark.operators.phash import (
            _to_gray,
            phash64_pixels,
        )

        for pdf in batches:
            ids, idxs, hs = [], [], []
            for doc_id, payload in zip(
                pdf[id_col].astype("int64"), pdf[binary_col]
            ):
                frames, _fps = decode_avi_frames(payload)
                for fi in range(0, frames.shape[0], every_n):
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    # gray once: the ptp gate and the hash share the
                    # h*w*3 luma matmul (phash64_pixels passes 2-D
                    # arrays through _to_gray unchanged)
                    gray = _to_gray(frames[fi])
                    degenerate = np.ptp(gray) <= _DEGENERATE_PTP
                    hs.append(None if degenerate else phash64_pixels(gray))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "phash": pd.array(hs, dtype="Int64"),
                }
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        run, schema=FRAME_HASH_SCHEMA
    )


def video_candidates(
    frame_hashes: DataFrame,
    id_col: str = "doc_id",
    min_match_frac: float = 0.5,
    max_hamming: int = 0,
) -> DataFrame:
    """Near-dup video pairs from (id, frame_idx, phash) rows: blocked
    equi-join on the frame hash (exact by default; pigeonhole blocks
    when ``max_hamming > 0``), most-common frame-offset vote, keep
    pairs whose vote covers ≥ ``min_match_frac`` of the shorter
    clip's sampled frames. Returns (id_a, id_b, match_frac, offset).
    """
    if not (0.0 < min_match_frac <= 1.0):
        raise ValueError("min_match_frac must be in (0, 1]")
    if max_hamming < 0:
        raise ValueError("max_hamming must be non-negative")
    lens = frame_hashes.groupBy(F.col(id_col)).agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    # constant (black/white/gray) frames were sentinel-marked NULL at
    # hash time (pixel-variance check — see _DEGENERATE_PTP); drop
    # them from matching only AFTER the n_frames count above, so the
    # match_frac denominator keeps the FULL sampled count and a clip
    # that is mostly constant frames cannot reach the threshold on
    # its few live frames
    frame_hashes = frame_hashes.filter(F.col("phash").isNotNull())
    if max_hamming == 0:
        a = frame_hashes.select(
            F.col("phash").alias("v"),
            F.col(id_col).alias("id_a"),
            F.col("frame_idx").alias("idx_a"),
        )
        b = frame_hashes.select(
            F.col("phash").alias("v"),
            F.col(id_col).alias("id_b"),
            F.col("frame_idx").alias("idx_b"),
        )
        matched = (
            a.join(b, "v")
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b",
                (F.col("idx_a") - F.col("idx_b")).alias("off"),
            )
        )
    else:
        # shared blocked-pigeonhole match (range-validated, per-frame-
        # pair deduped inside the helper)
        matched = blocked_hamming_matches(
            frame_hashes,
            frame_hashes,
            max_hamming,
            id_col=id_col,
            carry_cols=("frame_idx",),
        ).filter(F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b",
            (F.col("frame_idx_a") - F.col("frame_idx_b")).alias("off"),
        )
    best = vote_best_offset(matched)
    la = lens.select(F.col(id_col).alias("id_a"), F.col("n_frames").alias("n_a"))
    lb = lens.select(F.col(id_col).alias("id_b"), F.col("n_frames").alias("n_b"))
    return (
        best.join(la, "id_a")
        .join(lb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_match")
                / F.greatest(F.least("n_a", "n_b"), F.lit(1)).cast("double")
            ).alias("match_frac"),
            "offset",
        )
        .filter(F.col("match_frac") >= min_match_frac)
    )


def dedup_videos(
    videos: DataFrame,
    id_col: str,
    binary_col: str,
    every_n: int = 4,
    min_match_frac: float = 0.5,
    max_hamming: int = 0,
) -> DataFrame:
    """End-to-end near-duplicate VIDEO dedup: sample+hash frames,
    offset-consistent vote, transitive closure, keep the min-id
    canonical per cluster. Frame-hash table persists across the
    self-join (the decode is the expensive stage); the loser-ID
    anti-join broadcasts so video payloads never shuffle."""
    fh = with_frame_phashes(videos, id_col, binary_col, every_n).persist()
    try:
        pairs = video_candidates(
            fh, "doc_id",
            min_match_frac=min_match_frac, max_hamming=max_hamming,
        )
        return drop_near_duplicates(
            videos, pairs, id_col=id_col, broadcast_losers=True
        )
    finally:
        fh.unpersist()
