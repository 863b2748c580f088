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

Frame matching is EXACT on the 64-bit pHash by default — the
scan-cheap setting for byte-preserving duplicates — but exact
matching is measured NOT recall-1.0 against lossy re-encodes: a q85
MJPEG copy lands ~83 % of frames bit-exact ON AVERAGE, with
per-seed tails where too few sampled frames survive the vote (r12,
found by the recovery oracle). ``max_hamming=2`` absorbs the 1-2
bit codec noise at the small-radius pigeonhole's near-free cost
(measured 1.6× at 10× data); the dedup default stays 0 for the
byte-preserving workload, decontamination defaults to 2 (recall is
its purpose), and radii ≥ 8 inherit the image family's banded
doctrine (operators/phash.py).

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

from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
    MALFORMED_PAYLOAD_ERRORS,
)
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
    df: DataFrame, id_col: str, binary_col: str, every_n: int = 4,
    on_error: str = "raise",
) -> DataFrame:
    """(id, avi payload) → (doc_id, frame_idx, phash): decode every
    ``every_n``-th frame and pHash it, all inside one Arrow
    ``mapInPandas`` pass — pixels never leave the executor.
    Degenerate (near-constant) frames emit a NULL hash: the row still
    counts toward the clip's frame total (the match_frac denominator
    must stay the FULL sampled count so mostly-constant clips can't
    qualify on their few live frames), but NULL never joins.

    ``on_error="quarantine"`` (r14) emits NO frame rows for a clip
    whose container decode throws instead of failing the task: absent
    from the frame table, the clip can never vote or match and flows
    through dedup/decontamination as a survivor; recover the
    quarantine set by anti-joining clip ids against the frame table.
    Default ``"raise"`` keeps exact-pipeline semantics (doctrine in
    :func:`~...phash.with_phash`)."""
    if every_n <= 0:
        raise ValueError("every_n must be positive")
    if on_error not in ("raise", "quarantine"):
        raise ValueError(
            f"on_error must be 'raise' or 'quarantine' (got {on_error!r})"
        )
    quarantine = on_error == "quarantine"

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
                # frame_step pushes the every_n sampling INTO the
                # container decode (r16 optimization round): unsampled
                # MJPEG frames skip their Huffman/IDCT work outright,
                # so decode cost is proportional to frames hashed, not
                # frames stored. Sampled indices are j*every_n — the
                # same fi sequence the old full-decode loop emitted.
                if quarantine:
                    try:
                        frames, _fps = decode_avi_frames(
                            payload, frame_step=every_n
                        )
                    except MALFORMED_PAYLOAD_ERRORS:
                        continue  # quarantined: no frame rows
                else:
                    frames, _fps = decode_avi_frames(
                        payload, frame_step=every_n
                    )
                for j in range(frames.shape[0]):
                    ids.append(int(doc_id))
                    idxs.append(j * every_n)
                    # gray once: the ptp gate and the hash share the
                    # h*w*3 luma matmul (phash64_pixels passes 2-D
                    # arrays through _to_gray unchanged)
                    gray = _to_gray(frames[j])
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
    matched = _frame_matches(
        frame_hashes, frame_hashes, max_hamming, id_col
    ).filter(F.col("id_a") < F.col("id_b"))
    return _score_offset_votes(matched, lens, lens, id_col, min_match_frac)


def _frame_matches(
    frames_a: DataFrame,
    frames_b: DataFrame,
    max_hamming: int,
    id_col: str,
    broadcast_b: bool = False,
) -> DataFrame:
    """Frame-level matches between two frame-hash tables as
    UNORDERED (id_a, id_b, off) rows — exact-value equi-join at
    ``max_hamming == 0``, the shared blocked-pigeonhole match
    otherwise. Self-join callers apply ``id_a < id_b`` on top; the
    cross-table path keeps every pair (two distinct tables may reuse
    numeric ids, so no id comparison is meaningful there).

    Constant (black/white/gray) frames were sentinel-marked NULL at
    hash time (pixel-variance check — see ``_DEGENERATE_PTP``); drop
    them here, AFTER callers have taken their n_frames counts, so
    the match_frac denominator keeps the FULL sampled count and a
    clip that is mostly constant frames cannot reach the threshold
    on its few live frames."""
    frames_a = frames_a.filter(F.col("phash").isNotNull())
    frames_b = frames_b.filter(F.col("phash").isNotNull())
    if max_hamming == 0:
        a = frames_a.select(
            F.col("phash").alias("v"),
            F.col(id_col).alias("id_a"),
            F.col("frame_idx").alias("idx_a"),
        )
        b = frames_b.select(
            F.col("phash").alias("v"),
            F.col(id_col).alias("id_b"),
            F.col("frame_idx").alias("idx_b"),
        )
        return (
            a.join(F.broadcast(b) if broadcast_b else b, "v")
            .select(
                "id_a", "id_b",
                (F.col("idx_a") - F.col("idx_b")).alias("off"),
            )
        )
    # shared blocked-pigeonhole match (range-validated, per-frame-
    # pair deduped inside the helper)
    return blocked_hamming_matches(
        frames_a,
        frames_b,
        max_hamming,
        id_col=id_col,
        carry_cols=("frame_idx",),
        broadcast_b=broadcast_b,
    ).select(
        "id_a", "id_b",
        (F.col("frame_idx_a") - F.col("frame_idx_b")).alias("off"),
    )


def _score_offset_votes(
    matched: DataFrame,
    lens_a: DataFrame,
    lens_b: DataFrame,
    id_col: str,
    min_match_frac: float,
) -> DataFrame:
    """Most-common-offset vote over frame matches, scored against the
    shorter clip's FULL sampled frame count. Returns
    (id_a, id_b, match_frac, offset) above the threshold."""
    best = vote_best_offset(matched)
    la = lens_a.select(
        F.col(id_col).alias("id_a"), F.col("n_frames").alias("n_a")
    )
    lb = lens_b.select(
        F.col(id_col).alias("id_b"), F.col("n_frames").alias("n_b")
    )
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


def video_candidates_cross(
    frames_a: DataFrame,
    frames_b: DataFrame,
    id_col: str = "doc_id",
    min_match_frac: float = 0.5,
    max_hamming: int = 0,
    broadcast_b: bool = True,
) -> DataFrame:
    """Cross-table near-dup video pairs: the same frame-match →
    offset-vote → shorter-clip-fraction chain as
    :func:`video_candidates`, but between TWO frame-hash tables
    (id_a from ``frames_a``, id_b from ``frames_b``). No
    ``id_a < id_b`` ordering: the sides are distinct tables and
    every (a, b) hit matters. ``broadcast_b`` (default on) marks
    ``frames_b`` as the small side — the eval set in decontamination
    — broadcasting it through the frame join; pass False when
    neither side is broadcast-small (accepted-state tables ride the
    keyed shuffle instead)."""
    if not (0.0 < min_match_frac <= 1.0):
        raise ValueError("min_match_frac must be in (0, 1]")
    if max_hamming < 0:
        raise ValueError("max_hamming must be non-negative")
    lens_a = frames_a.groupBy(F.col(id_col)).agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    lens_b = frames_b.groupBy(F.col(id_col)).agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    matched = _frame_matches(
        frames_a, frames_b, max_hamming, id_col, broadcast_b=broadcast_b
    )
    return _score_offset_votes(
        matched, lens_a, lens_b, id_col, min_match_frac
    )


def decontaminate_videos(
    corpus: DataFrame,
    eval_videos: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    every_n: int = 4,
    min_match_frac: float = 0.5,
    max_hamming: int = 2,
    broadcast_ids: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Drop corpus clips that are near-duplicates of any EVAL-set
    video — the video twin of phash.decontaminate_images /
    audio_fp.decontaminate_audio: training on benchmark footage
    contaminates every evaluation that uses it, and re-encoded /
    head-trimmed copies evade exact-hash checks.

    ``max_hamming`` defaults to 2 HERE, unlike the dedup path's 0:
    recall is the one property a decontamination pass exists for,
    and exact-value frame matching is measured NOT recall-1.0
    against lossy re-encodes (per-seed bit-exact-frame tails fall
    under the vote threshold — see :func:`dedup_videos`); the
    radius-2 pigeonhole absorbs the 1-2 bit codec noise at near-zero
    cost. The same deliberate recall-first asymmetry as
    ``decontaminate_images``' pigeonhole default.

    Pixels never leave the executors on either side — only 8-byte
    frame hashes join, with the eval side broadcast. Same lifecycle
    as the audio twin: both frame-hash tables feed two consumers
    (the n_frames count and the match join), so both persist and the
    contaminated-ID set is materialized through
    ``materialize_and_release``, leaving the session cache clean.
    Returns the clean corpus rows."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.caching import (
        materialize_and_release,
    )

    # corpus-side quarantine only — a quarantined EVAL clip emits no
    # frame rows and can protect nothing (every corpus near-dup of it
    # leaks silently); eval sets are curated, so a corrupt one raises
    # (review-found r14, same rule as the image/audio twins)
    fh_c = with_frame_phashes(
        corpus, id_col, binary_col, every_n, on_error=on_error
    ).persist()
    fh_e = with_frame_phashes(
        eval_videos, id_col, binary_col, every_n
    ).persist()
    # materialize the caches EAGERLY before building the consumer
    # plan: the per-clip frame count and the match join are parallel
    # branches of one action, and two concurrently-scheduled stages
    # reading a not-yet-populated cache EACH recompute it — i.e. the
    # full corpus decodes twice, nondeterministically (r13 found:
    # warm-rep CPU on this path alternated 90 vs 450 CPU-s on
    # identical inputs; stage-level REST attribution showed the
    # duplicate decode). One count() per table pins one decode.
    fh_c.count()
    fh_e.count()
    hits = video_candidates_cross(
        fh_c,
        fh_e,
        id_col=id_col,
        min_match_frac=min_match_frac,
        max_hamming=max_hamming,
    )
    contaminated = materialize_and_release(
        hits.select(F.col("id_a").alias(id_col)).distinct(), fh_c, fh_e
    )
    # BROADCAST the contaminated-ID set — same r13 finding as the
    # audio twin: the plain anti-join shuffled the corpus payloads
    # (300 MB at sf0.1); the broadcast keeps pixels on the scan
    # side. ``broadcast_ids=False`` escapes to a plain anti-join for
    # contamination so extreme the ID set outgrows the broadcast /
    # driver limits (r14). THRESHOLD (r15, measured on the image twin
    # — scripts/decontam_broadcast_rung.py): default True until the
    # id set nears broadcast limits (~10⁷-10⁸ ids); the escape then
    # trades one payload-bearing corpus shuffle for the OOM, and
    # below that AQE re-broadcasts the tiny id side at runtime
    # (identical survivors, ≤0.4 MB shuffle at sf0.1).
    ids = F.broadcast(contaminated) if broadcast_ids else contaminated
    return corpus.join(ids, id_col, "left_anti")


def dedup_videos(
    videos: DataFrame,
    id_col: str,
    binary_col: str,
    every_n: int = 4,
    min_match_frac: float = 0.5,
    max_hamming: int = 0,
    on_error: str = "raise",
) -> DataFrame:
    """End-to-end near-duplicate VIDEO dedup: sample+hash frames,
    offset-consistent vote, transitive closure, keep the min-id
    canonical per cluster. Frame-hash table persists across the
    self-join (the decode is the expensive stage); the loser-ID
    anti-join broadcasts so video payloads never shuffle.

    Choosing ``max_hamming`` — a WORKLOAD property, not a scale one
    (contrast the image family's ``method="auto"``, which a corpus
    count can size): exact-value frame matching (the 0 default) is
    the scan-cheap setting for byte-preserving duplicates (container
    remux, head/tail trims, re-wraps), but it is NOT recall-1.0
    against lossy re-encodes — measured (r12): an MJPEG-q85 copy's
    bit-exact frame rate is ~83 % on AVERAGE with per-seed tails
    below the 0.5 vote (one sf0.01 planted variant kept only 2 of 6
    sampled frames exact and survived). Codec noise is a 1-2 bit
    per-frame phenomenon, so ``max_hamming=2`` restores recall at
    the small-radius pigeonhole's near-free cost (3 blocks × 21-bit
    keys, measured 1.6× at 10× data — no quadratic term at this
    radius). Rule: re-encoded inputs → 2; byte-preserving inputs →
    0; radii ≥ 8 would inherit the image family's banded doctrine."""
    fh = with_frame_phashes(
        videos, id_col, binary_col, every_n, on_error=on_error
    ).persist()
    try:
        # eager cache materialization — the frame-count and
        # frame-match branches race an unpopulated cache into a
        # duplicate decode otherwise (see decontaminate_videos)
        fh.count()
        pairs = video_candidates(
            fh, "doc_id",
            min_match_frac=min_match_frac, max_hamming=max_hamming,
        )
        return drop_near_duplicates(
            videos, pairs, id_col=id_col, broadcast_losers=True
        )
    finally:
        fh.unpersist()
