"""Baseline JPEG codec (operators/jpeg.py): lossy round trips pinned
as PSNR floors + an exact DC-only case, the entropy layer pinned
against a HAND-COMPUTED spec-side bitstream (independent of both the
encoder and decoder), 4:2:0 and restart-marker paths, the rejection
envelope, and the multimodal dispatch end-to-end."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
    sniff_format,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 2) % 256, (xx * 2) % 256, (yy + xx) % 256], -1
    ).astype(np.uint8)


def test_sniff_and_markers():
    p = encode_jpeg(_gradient(16, 16))
    assert sniff_format(p) == "jpeg"
    assert p[:3] == b"\xff\xd8\xff" and p[-2:] == b"\xff\xd9"
    # deterministic bytes
    assert p == encode_jpeg(_gradient(16, 16))


def test_dc_only_constant_image_is_exact():
    """A constant image is DC-only; for a luma value whose shifted DC
    (8·(v−128)) is a multiple of the DC quant step the round trip is
    EXACT — quantization introduces zero error. 120 → DC −64, luma
    q[0,0]=16 at quality 50 → quantized −4 exactly."""
    c = np.full((24, 16, 3), 120, np.uint8)
    out = decode_jpeg(encode_jpeg(c, quality=50))
    assert out.shape == (24, 16, 3)
    assert int(np.abs(out.astype(int) - 120).max()) == 0
    # arbitrary constants: error bounded by half the DC quant step / 8
    for v in (57, 201):
        out = decode_jpeg(encode_jpeg(np.full((8, 8), v, np.uint8), quality=50))
        assert int(np.abs(out.astype(int) - v).max()) <= 2


def test_entropy_bits_match_hand_computed_spec_stream():
    """8×8 grayscale constant 136: shifted block is all +8, so the
    quantized DCT is DC=+4 (64/16), all AC zero. Per spec F.1.2:
    DC category 3 (Annex K luma DC code for 3 = '100'), magnitude
    bits '100' (4), then EOB (luma AC code for 0x00 = '1010') →
    '100'+'100'+'1010' = 0b1001001010, padded with 1s to
    0b10010010_10111111 = 0x92 0xBF. Pinned byte-for-byte against
    the encoder's entropy segment — computed here from the published
    Annex-K tables, not from the module."""
    p = encode_jpeg(np.full((8, 8), 136, np.uint8), quality=50)
    # entropy data sits between the SOS header and EOI
    sos = p.find(b"\xff\xda")
    (seglen,) = struct.unpack_from(">H", p, sos + 2)
    entropy = p[sos + 2 + seglen : -2]
    assert entropy == bytes([0b10010010, 0b10111111])
    assert int(decode_jpeg(p)[0, 0]) == 136


def test_roundtrip_psnr_floors():
    g = _gradient(64, 96)
    assert _psnr(g, decode_jpeg(encode_jpeg(g, quality=95))) > 45
    assert _psnr(g, decode_jpeg(encode_jpeg(g, quality=95, subsampling="420"))) > 40
    yy, xx = np.mgrid[0:48, 0:56]
    smooth = (128 + 60 * np.sin(yy / 9.0) + 50 * np.cos(xx / 7.0))
    im = np.clip(
        np.stack([smooth, smooth * 0.8 + 20, 255 - smooth], -1), 0, 255
    ).astype(np.uint8)
    assert _psnr(im, decode_jpeg(encode_jpeg(im, quality=75))) > 35
    # grayscale
    gs = ((yy * 3 + xx) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(gs, quality=90))
    assert out.shape == gs.shape and _psnr(gs, out) > 40


def test_non_multiple_of_8_dimensions():
    for shape, sub in [((37, 41), "444"), ((19, 27), "444"), ((37, 41), "420")]:
        img = _gradient(*shape)
        out = decode_jpeg(encode_jpeg(img, quality=92, subsampling=sub))
        assert out.shape == img.shape
        assert _psnr(img, out) > 35


def test_restart_markers_resync():
    g = _gradient(48, 48)
    p = encode_jpeg(g, quality=92, restart_interval=2)
    assert b"\xff\xdd" in p  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in p for i in range(8))
    assert _psnr(g, decode_jpeg(p)) > 40
    # interval=1 resets predictors every MCU — hardest resync case
    p1 = encode_jpeg(g, quality=92, restart_interval=1)
    assert _psnr(g, decode_jpeg(p1)) > 40


def test_420_smaller_than_444():
    g = _gradient(64, 64)
    assert len(encode_jpeg(g, quality=90, subsampling="420")) < len(
        encode_jpeg(g, quality=90, subsampling="444")
    )


def test_rejections():
    good = encode_jpeg(_gradient(16, 16))
    with pytest.raises(NotImplementedError, match="SOI"):
        decode_jpeg(b"\x89PNGnope")
    # SOF2 is supported since r10 — but a BASELINE scan (Ss=0, Se=63)
    # inside a progressive frame is malformed, not unimplemented
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="mixes DC and AC"):
        decode_jpeg(prog)
    # arithmetic coding stays NotImplementedError
    arith = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(arith)
    # truncated entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])
    # 12-bit precision: patch SOF precision byte
    bad = bytearray(good)
    sof = bad.index(b"\xff\xc0")
    bad[sof + 4] = 12
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError):
        encode_jpeg(_gradient(8, 8), quality=0)
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(_gradient(8, 8), subsampling="422")


def test_fill_bytes_before_marker_accepted():
    """B.1.1.2: any number of 0xFF fill bytes may pad before a marker
    code — decode must skip them, not die on 'marker expected'."""
    good = encode_jpeg(_gradient(16, 16))
    i = good.index(b"\xff\xdb")  # first DQT
    padded = good[:i] + b"\xff\xff\xff" + good[i:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(good))


def test_multi_scan_sos_rejected_cleanly():
    """A baseline stream whose SOS lists fewer components than the
    frame (non-interleaved multi-scan) must raise NotImplementedError
    before the MCU walk, not KeyError mid-decode."""
    good = encode_jpeg(_gradient(16, 16))  # 3-component frame
    i = good.index(b"\xff\xda")
    one_comp_sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(good[:i] + one_comp_sos + good[i + 2 + 12 :])


def _strip_dht(jpeg: bytes) -> bytes:
    out = bytearray(jpeg[:2])
    pos = 2
    while pos + 4 <= len(jpeg):
        marker = jpeg[pos + 1]
        if marker == 0xDA:
            out += jpeg[pos:]
            return bytes(out)
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker != 0xC4:
            out += jpeg[pos : pos + 2 + seglen]
        pos += 2 + seglen
    raise AssertionError("no SOS")


def test_default_huffman_mjpeg_convention():
    """DHT-less streams: decode(default_huffman=True) applies the
    Annex-K tables and matches the un-stripped decode exactly (the
    encoder uses exactly those tables); without the flag a missing
    DHT stays a ValueError — and explicit DHT segments still win
    when present."""
    for img in (_gradient(16, 24), _gradient(9, 9)[:, :, 0]):
        good = encode_jpeg(img, quality=85)
        stripped = _strip_dht(good)
        assert len(stripped) < len(good)
        with pytest.raises(ValueError, match="missing DHT"):
            decode_jpeg(stripped)
        assert np.array_equal(
            decode_jpeg(stripped, default_huffman=True), decode_jpeg(good)
        )
        # tables present: flag is a no-op, not an override
        assert np.array_equal(
            decode_jpeg(good, default_huffman=True), decode_jpeg(good)
        )


def test_multimodal_dispatch_jpeg(spark):
    """extract_features / resize_payloads real paths handle JPEG
    payloads mixed with BMP/PNG inside one Arrow batch."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        encode_bmp,
        encode_png,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.multimodal import (
        decode_image,
        extract_features,
        resize_image,
    )

    g = _gradient(32, 32)
    jp = encode_jpeg(g, quality=95)
    feats = decode_image(jp)
    dec = decode_jpeg(jp)
    assert feats["byte_sum"] == int(dec.sum(dtype=np.int64))
    assert feats["n_frames"] == 1

    # resize target must clear JPEG's ~620-byte fixed header floor
    # (JFIF + DQT + Annex-K DHT segments) — use a payload that dwarfs it
    big = encode_jpeg(_gradient(160, 160), quality=95)
    target = len(big) // 3
    assert target > 700
    small = resize_image(big, target)
    assert sniff_format(small) == "jpeg" and len(small) <= target
    assert decode_jpeg(small).shape[0] < 160

    rows = [
        (1, bytearray(encode_bmp(g))),
        (2, bytearray(encode_png(g))),
        (3, bytearray(jp)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in extract_features(df, "doc_id", "payload", fake_decoder=False).collect()
    }
    assert got[1]["byte_sum"] == got[2]["byte_sum"] == int(g.sum(dtype=np.int64))
    assert got[3]["byte_sum"] == int(dec.sum(dtype=np.int64))


# ------------------------------------------------- progressive (SOF2)


def test_progressive_equals_baseline_pixels():
    """The 4-phase progressive scan script transmits EXACTLY the
    baseline-quantized coefficients, so after full refinement the
    decoder must produce pixel-IDENTICAL output to the baseline
    encode at the same quality/subsampling — across odd dims, both
    subsamplings, grayscale and RGB."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    cases = [
        (_gradient(16, 16), "444", 90),
        (_gradient(24, 40), "420", 75),
        (_gradient(17, 23), "444", 90),   # non-multiple-of-8
        (_gradient(21, 33), "420", 50),   # odd dims + subsampling
    ]
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    cases.append((noisy, "420", 85))     # dense AC spectrum
    gray = _gradient(19, 26)[..., 0]
    cases.append((gray, "444", 90))
    for img, sub, q in cases:
        base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        prog_payload = encode_jpeg_progressive(img, quality=q, subsampling=sub)
        assert b"\xff\xc2" in prog_payload  # really SOF2
        prog = decode_jpeg(prog_payload)
        assert prog.shape == base.shape
        assert np.array_equal(prog, base), (img.shape, sub, q)


def test_progressive_deterministic_and_sniffs():
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    p1 = encode_jpeg_progressive(_gradient(16, 16))
    p2 = encode_jpeg_progressive(_gradient(16, 16))
    assert p1 == p2
    assert sniff_format(p1) == "jpeg"


def test_progressive_partial_scans_are_an_approximation():
    """Stopping after the first-approximation scans (drop both
    refinement scans from the stream) must still decode — at lower
    fidelity than the full stream, which is progressive rendering's
    entire point. Construct the truncated stream by re-encoding with
    the refinement scans stripped at the marker level."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    img = _gradient(24, 24)
    payload = encode_jpeg_progressive(img, quality=90)
    # scans are delimited by FFDA; keep SOI..end-of-scan-4 of 8 total
    # markers: headers + [DC1, AC1x3, DCr, ACr x3] → cut before the
    # 5th SOS (the DC refinement) and close with EOI
    sos_positions = []
    i = 0
    while True:
        i = payload.find(b"\xff\xda", i)
        if i < 0:
            break
        sos_positions.append(i)
        i += 2
    assert len(sos_positions) == 8  # DC + 3 AC + DC refine + 3 AC refine
    truncated = payload[: sos_positions[4]] + b"\xff\xd9"
    full = decode_jpeg(payload)
    approx = decode_jpeg(truncated)
    assert approx.shape == full.shape
    # approximation is close but NOT identical (refinement bits matter)
    assert _psnr(img, approx) > 20.0
    assert _psnr(img, full) > _psnr(img, approx)
    assert not np.array_equal(approx, full)


def test_progressive_eob_runs_decode():
    """General EOB runs (length > 1) are decoder-supported even though
    our encoder holds runs at 1: splice a custom AC Huffman table
    (defining the EOBRUN symbol 0x10, absent from the Annex-K tables)
    between scans and rewrite both luma AC scans of a 2-block
    grayscale image as a single EOBRUN=2 — also exercising
    DHT-redefinition between scans."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    img = np.full((8, 16), 131, np.uint8)  # DC-only: AC all zero
    payload = bytes(encode_jpeg_progressive(img, quality=90))
    sos_positions = []
    i = 0
    while True:
        i = payload.find(b"\xff\xda", i)
        if i < 0:
            break
        sos_positions.append(i)
        i += 2
    # grayscale script: [DC first, AC first, DC refine, AC refine]
    assert len(sos_positions) == 4
    dc1, ac1, dcr, acr = sos_positions

    def sos_hdr(p):  # SOS marker + header segment
        ln = struct.unpack_from(">H", payload, p + 2)[0]
        return payload[p : p + 2 + ln]

    # custom AC table 0: single symbol 0x10 (EOBRUN, r=1) = code '0'
    bits = [1] + [0] * 15
    dht = b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1) + bytes(
        [0x10] + bits + [0x10]
    )
    # scan bits: '0' (symbol) + '0' (1 extension bit → run 2), 1-padded
    eob2 = bytes([0b00111111])
    rebuilt = (
        payload[:ac1]                    # headers + DC-first scan
        + dht
        + sos_hdr(ac1) + eob2            # AC first as EOBRUN=2
        + payload[dcr:acr]               # DC refinement unchanged
        + sos_hdr(acr) + eob2            # AC refine as EOBRUN=2
        + b"\xff\xd9"
    )
    out = decode_jpeg(rebuilt)
    # both blocks all-zero AC → flat image survives
    assert np.array_equal(out, decode_jpeg(payload))


def test_batched_idct_matches_per_block_bitwise():
    """r17: _decode_scan defers dequantize+IDCT to one stacked matmul
    per component. The stacked ``_A.T @ B @ _A`` must be bit-identical
    to the old per-block expression on this host's BLAS — pinned here
    over adversarial dense/sparse coefficient stacks so a NumPy/BLAS
    upgrade that changes the stacked kernel's summation order fails
    loudly instead of drifting pixels (einsum, which reassociates,
    was measured to drift a .5-boundary pixel and stays rejected)."""
    import numpy as np

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.jpeg import _A

    rng = np.random.default_rng(1234)
    for density in (0.05, 0.5, 1.0):
        blocks = rng.integers(
            -2047 * 255, 2047 * 255, size=(512, 8, 8)
        ).astype(np.int64)
        blocks[rng.random((512, 8, 8)) >= density] = 0
        per = np.empty((512, 8, 8))
        for i in range(512):
            per[i] = _A.T @ blocks[i] @ _A + 128.0
        bat = _A.T @ blocks @ _A + 128.0
        assert np.array_equal(per.view(np.uint64), bat.view(np.uint64))
