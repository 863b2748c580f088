"""Perceptual image hashing + near-duplicate image dedup.

The LAION-style capability every multimodal training corpus needs:
detect images that are the SAME picture re-encoded, resized, or
quality-degraded (classic pHash/dHash family), then keep one canonical
copy per cluster. Text near-dup (MinHash/SimHash) can't see this —
two encodings of one photo share no bytes.

Algorithms (both public classics):

* **pHash** (DCT hash, pHash.org / imagehash lineage): grayscale →
  area-mean resize to 32×32 → 2-D orthonormal DCT-II → keep the
  top-left 8×8 low-frequency block → bit i = coeff_i > median(block).
  Low-frequency structure survives re-encoding and rescaling, so
  near-duplicate images land within a few bits.
* **dHash** (difference hash, Krawetz): grayscale → area-mean resize
  to 8×9 → bit (r,c) = px[r,c] > px[r,c+1] (horizontal gradient
  signs). Cheaper, no DCT; slightly less robust to rescaling.

Both emit a SIGNED 64-bit long (Spark has no unsigned), so Hamming
distance is ``bit_count(a ^ b)`` — one codegen expression.

Scale design — identical shape to the proven SimHash path
(operators/dedup_fuzzy.py): hashes are computed executor-side over
Arrow-batched ``mapInPandas`` (the decode is the only genuinely
non-vectorizable step: codec calls), then candidate pairs come from
the rotating-block pigeonhole join — a 64-bit hash cut into
``max_hamming+1`` disjoint blocks; two hashes within the bound differ
in at most ``max_hamming`` blocks so at least one block matches
exactly, and the blocked equi-join (never all-pairs) has recall 1.0
at the bound. At 100 TB of images nothing here is pairwise: hashing
is a scan, candidates are a keyed self-join on (blk, val), the
verifier is one xor+bit_count per surviving pair, and the closure is
the shared :func:`~...dedup_fuzzy.dup_components`.

Reference tie: the reference pipeline (main_pipeline.py:1-369)
ingests structured sensor rows and has no image stage; this module
belongs to the training-data-pipeline extension surface (SURVEY
§2.12 multimodal scope, VERDICT r10 top-next).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_fuzzy import (
    drop_near_duplicates,
    simhash_candidates,
)

# --------------------------------------------------------- pixel math


def synth_image(seed: int, h: int = 96, w: int = 128) -> np.ndarray:
    """Deterministic structured synthetic image, seeded — the shared
    fixture generator for the pHash tests and the ``dedup_phash``
    bench head (the container ships no media testdata).

    Two components: Gaussian blobs (smooth, image-like structure —
    perceptual hashing needs low-frequency content, which pure noise
    lacks) PLUS a seeded random low-frequency spectrum rendered
    through the inverse 32-point DCT. The spectrum term matters at
    corpus scale: blobs alone live in a tiny perceptual subspace and
    distinct seeds collide within the dedup threshold once the corpus
    reaches tens of thousands (measured: 24/44 850 distinct pairs
    within 8 bits, which over-merges the planted clusters); injecting
    entropy directly into the hashed 8×8 low-frequency block pushes
    distinct images apart (min pairwise distance 14 over 400 seeds,
    0 pairs ≤ 8 bits) while format-level variants still drift ≤ 6."""
    r = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w))
    for _ in range(6):
        cy, cx = r.uniform(0, h), r.uniform(0, w)
        amp, sig = r.uniform(40, 120), r.uniform(10, 40)
        img += amp * np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / (2 * sig**2))
    spec = np.zeros((32, 32))
    spec[:8, :8] = r.normal(0, 1, (8, 8))
    spec[0, 0] = 0.0
    lf = _DCT32.T @ spec @ _DCT32
    ri = (np.arange(h) * 32) // h
    ci = (np.arange(w) * 32) // w
    img += 60.0 * lf[ri][:, ci] / (np.abs(lf).max() + 1e-9)
    img = (img - img.min()) / (np.ptp(img) + 1e-9) * 255
    return np.repeat(img[:, :, None], 3, axis=2).astype(np.uint8)


def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal n-point DCT-II basis (same construction as the
    8-point basis in operators/jpeg.py, generalized): row k is
    ``s_k * cos((2j+1) k π / 2n)`` with s_0=√(1/n), s_k=√(2/n)."""
    j = np.arange(n)
    k = j.reshape(-1, 1)
    basis = np.cos((2 * j + 1) * k * np.pi / (2 * n))
    basis[0] *= np.sqrt(1.0 / n)
    basis[1:] *= np.sqrt(2.0 / n)
    return basis


_DCT32 = _dct_basis(32)


def _to_gray(img: np.ndarray) -> np.ndarray:
    """(h,w[,3]) uint8 → float64 luma (ITU-R BT.601 weights, the
    JPEG/pHash convention). Already-2-D images pass through."""
    if img.ndim == 2:
        return img.astype(np.float64)
    rgb = img[:, :, :3].astype(np.float64)
    return rgb @ np.array([0.299, 0.587, 0.114])


def _area_resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box/area-mean downsample to (out_h, out_w) — the smoothing
    resize perceptual hashing needs (nearest-neighbor aliases: a
    0.9× rescaled variant would sample DIFFERENT source pixels and
    drift many bits). Bin edges by floor(i·n/out); inputs smaller
    than the target are nearest-upsampled first so no bin is empty."""
    h, w = gray.shape
    if h < out_h or w < out_w:
        ri = np.minimum((np.arange(max(out_h, h)) * h) // max(out_h, h), h - 1)
        ci = np.minimum((np.arange(max(out_w, w)) * w) // max(out_w, w), w - 1)
        gray = gray[ri][:, ci]
        h, w = gray.shape
    re = (np.arange(out_h + 1) * h) // out_h
    ce = (np.arange(out_w + 1) * w) // out_w
    # integral image → exact block sums in O(out_h·out_w)
    ii = np.zeros((h + 1, w + 1))
    ii[1:, 1:] = gray.cumsum(0).cumsum(1)
    sums = ii[re[1:, None], ce[None, 1:]] - ii[re[:-1, None], ce[None, 1:]] \
        - ii[re[1:, None], ce[None, :-1]] + ii[re[:-1, None], ce[None, :-1]]
    areas = (re[1:] - re[:-1])[:, None] * (ce[1:] - ce[:-1])[None, :]
    return sums / areas


def _bits_to_long(bits: np.ndarray) -> int:
    """64 bools (MSB first) → SIGNED 64-bit int (Spark long)."""
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def phash64_pixels(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash of a decoded image array."""
    g = _area_resize(_to_gray(img), 32, 32)
    low = (_DCT32 @ g @ _DCT32.T)[:8, :8].ravel()
    return _bits_to_long(low > np.median(low))


def dhash64_pixels(img: np.ndarray) -> int:
    """64-bit difference (gradient-sign) hash of a decoded image."""
    g = _area_resize(_to_gray(img), 8, 9)
    return _bits_to_long((g[:, 1:] > g[:, :-1]).ravel())


def _decode_any(payload: bytes) -> np.ndarray:
    """Decode BMP/PNG/JPEG via the repo codecs (operators/codecs.py,
    operators/jpeg.py); other magics raise NotImplementedError with
    the same contract as operators/multimodal.py::decode_image."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        decode_bmp,
        decode_png,
        sniff_format,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
    )

    kind = sniff_format(payload)
    decoders = {"bmp": decode_bmp, "png": decode_png, "jpeg": decode_jpeg}
    if kind not in decoders:
        raise NotImplementedError(
            "perceptual hashing decodes uncompressed BMP, PNG, and "
            "baseline/progressive JPEG (the repo codecs); other formats "
            "need external codec libraries"
        )
    return decoders[kind](payload)


def phash64_bytes(payload: bytes) -> int:
    """pHash of an encoded image payload (decode + hash)."""
    return phash64_pixels(_decode_any(payload))


def dhash64_bytes(payload: bytes) -> int:
    """dHash of an encoded image payload (decode + hash)."""
    return dhash64_pixels(_decode_any(payload))


# ------------------------------------------------------- Spark surface

PHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("phash", LongType())]
)


def with_phash(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    algo: str = "phash",
) -> DataFrame:
    """(id, payload) → (doc_id, phash) via Arrow-batched
    ``mapInPandas`` — whole record batches per python worker, the
    per-payload decode is the only Python loop (same scale shape as
    operators/multimodal.py::extract_features). ``algo`` picks
    ``"phash"`` (DCT) or ``"dhash"`` (gradient)."""
    if algo not in ("phash", "dhash"):
        raise ValueError(f"algo must be 'phash' or 'dhash' (got {algo!r})")
    fn = phash64_bytes if algo == "phash" else dhash64_bytes

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "phash": [fn(p) for p in pdf[binary_col]],
                }
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        run, schema=PHASH_SCHEMA
    )


def phash_candidates(
    hashes: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 10,
    hash_col: str = "phash",
) -> DataFrame:
    """Candidate near-dup image pairs from a (id, phash) frame —
    guaranteed recall 1.0 at ``hamming <= max_hamming`` via the
    rotating-block pigeonhole join (the SimHash construction,
    operators/dedup_fuzzy.py::simhash_candidates, reused verbatim:
    the blocking is a property of 64-bit Hamming space, not of the
    hash that produced the code). Returns (id_a, id_b, hamming);
    filter on hamming to taste — pHash practice: ≤10 near-dup."""
    return simhash_candidates(
        hashes.select(F.col(id_col), F.col(hash_col).alias("simhash")),
        id_col,
        bits=64,
        max_hamming=max_hamming,
    )


def phash_candidates_banded(
    hashes: DataFrame,
    id_col: str = "doc_id",
    bands: int = 12,
    bits_per_band: int = 16,
    seed: int = 7,
    hash_col: str = "phash",
) -> DataFrame:
    """Probabilistic candidate pairs — the SCALE path past the exact
    pigeonhole join's quadratic wall.

    Why it exists: guaranteed recall at Hamming radius b on a W-bit
    hash forces block keys of W/(b+1) bits (multi-index hashing's
    known tradeoff — Norouzi et al.), so the bucket self-join costs
    ~n²·(b+1)/2^(W/(b+1)) REGARDLESS of how uniform the hash is: at
    64 bits / b=8 that is 7-bit keys, measured 1.4 G intermediate
    rows at just 200 k images (the sf1 rung's 5.6× super-linear
    wall). And widening the hash doesn't escape — perceptual drift
    grows with hash width, so W/(b+1) stays ~constant.

    The standard subquadratic answer is banded bit-sampling LSH (the
    MinHash-band construction transplanted to Hamming space): each of
    ``bands`` keys packs ``bits_per_band`` SAMPLED bit positions
    (deterministic from ``seed``); a pair at Hamming distance d
    collides in one band with p = 1−(1−((W−d)/W)^k)^L — at k=16,
    L=12: ≈0.94 at d=6, ≈0.995 at d=4, →1 at d≤2 (re-encode variants
    measure d≤4 typical, ≤6 worst) — while random 50 %-agreement
    pairs collide at ~L/2^k = 12/65 536, i.e. ~200× fewer candidate
    rows than the b=8 pigeonhole at 200 k images. ``bits_per_band``
    is the knob that scales with log₂(n); the exact verifier
    downstream keeps precision exact either way."""
    if not (1 <= bits_per_band <= 62):
        raise ValueError("bits_per_band must be in [1, 62]")
    import random

    rng = random.Random(seed)
    specs = []
    for bi in range(bands):
        pos = rng.sample(range(64), bits_per_band)
        key = F.lit(0).cast("long")
        for j, p in enumerate(pos):
            key = key + F.shiftleft(
                F.shiftrightunsigned(F.col(hash_col), p).bitwiseAND(F.lit(1)),
                j,
            )
        specs.append(F.struct(F.lit(bi).alias("blk"), key.alias("val")))
    blocked = hashes.select(
        F.col(id_col), F.col(hash_col), F.explode(F.array(*specs)).alias("b")
    ).select(
        id_col,
        hash_col,
        F.col("b.blk").alias("blk"),
        F.col("b.val").alias("val"),
    )
    a = blocked.select(
        "blk", "val", F.col(id_col).alias("id_a"), F.col(hash_col).alias("h_a")
    )
    b = blocked.select(
        "blk", "val", F.col(id_col).alias("id_b"), F.col(hash_col).alias("h_b")
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, ["blk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
    )


def dedup_phash(
    images: DataFrame,
    id_col: str,
    binary_col: str,
    max_hamming: int = 10,
    algo: str = "phash",
    method: str = "pigeonhole",
) -> DataFrame:
    """End-to-end near-duplicate IMAGE dedup: hash every payload,
    generate blocked candidates, verify exact Hamming ≤ bound, resolve
    transitive clusters, keep the min-id canonical per cluster.

    Every stage is the proven dedup shape: scan-side hashing, keyed
    equi-join candidates (no-cartesian plan-pinned in tests),
    xor+bit_count verify, shared
    :func:`~...dedup_fuzzy.drop_near_duplicates` closure. Returns the
    surviving rows of ``images``.

    The final anti-join BROADCASTS the loser-ID set so the wide
    payload column never shuffles (losers are verified-pairs-bounded
    — orders smaller than the payload bytes; measured: 113 MB of
    payload shuffle → ~0 on the bench corpus). At a scale where the
    loser set itself outgrows broadcast, call the stages directly
    with ``drop_near_duplicates(broadcast_losers=False)``.

    ``method`` picks the candidate generator: ``"pigeonhole"``
    (default) is :func:`phash_candidates` — recall GUARANTEED 1.0 at
    the bound, cost ~n²(b+1)/2^(64/(b+1)) from the narrow block keys
    (right up to ~10⁵-10⁶ images); ``"banded"`` is
    :func:`phash_candidates_banded` — sampled-bit LSH, recall ≈0.94+
    at the measured variant drift but subquadratic-tunable, the
    100 TB path. Precision is exact either way (the Hamming verify
    runs on candidates).

    The hash table PERSISTS across the candidate self-join: hashing
    is the expensive stage (a codec decode per payload), the blocked
    self-join references it on BOTH sides, and the closure evaluates
    the pair set once more — uncached, the decode ran 3×. The cached
    frame is 16 bytes/row — at 10⁹ images ~16 GB cluster-wide, noise
    next to the payloads — and is released before returning (the
    closure has materialized the pairs by then)."""
    if method not in ("pigeonhole", "banded"):
        raise ValueError(f"method must be 'pigeonhole' or 'banded' (got {method!r})")
    hashes = with_phash(images, id_col, binary_col, algo=algo).persist()
    try:
        if method == "pigeonhole":
            cand = phash_candidates(hashes, "doc_id", max_hamming=max_hamming)
        else:
            cand = phash_candidates_banded(hashes, "doc_id")
        pairs = cand.filter(F.col("hamming") <= max_hamming)
        return drop_near_duplicates(
            images, pairs, id_col=id_col, broadcast_losers=True
        )
    finally:
        hashes.unpersist()


def decontaminate_images(
    corpus: DataFrame,
    eval_images: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    max_hamming: int = 8,
) -> DataFrame:
    """Drop corpus images that are near-duplicates of any EVAL-set
    image — the image twin of the n-gram text decontaminator
    (operators/decontaminate.py): training on benchmark images
    contaminates every evaluation that uses them, and re-encoded /
    rescaled copies evade exact-hash checks.

    Both sides hash executor-side; candidates come from the
    pigeonhole blocked join (recall 1.0 at the bound — the property a
    DECONTAMINATION pass actually needs: a missed eval twin is a
    silent benchmark leak, so the guaranteed-recall generator is the
    right default even at its quadratic-bucket cost, and eval sets
    are small, so the bucket term is n_corpus × n_eval / 2^w, not
    corpus-squared); matches anti-join away with the eval-side hash
    table broadcast-friendly small. Returns the clean corpus rows."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_fuzzy import (
        blocked_hamming_matches,
    )

    c_hash = with_phash(corpus, id_col, binary_col)
    e_hash = with_phash(eval_images, id_col, binary_col)
    contaminated = (
        blocked_hamming_matches(c_hash, e_hash, max_hamming, broadcast_b=True)
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")
