"""Codec robustness fuzz (r14): every decoder's public entry point
holds the malformed-payload contract under adversarial bytes —
truncations, bit flips, and random splices of valid payloads either
decode or raise ``ValueError`` / ``NotImplementedError``, never a
stray exception class (fuzzing found raw ``IndexError`` /
``OverflowError`` leaking from the JPEG Huffman paths and
``struct.error`` from the RIFF walkers before the r14 wrappers), and
crafted headers cannot declare allocation-bomb dimensions
(``MAX_DECODE_PIXELS``).

Deterministic (derandomized hypothesis profile + fixed seeds): a CI
failure reproduces exactly.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sensorstream_scalable_sensor_data_pipeline_spark.operators.audio_fp import (
    synth_clip,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
    decode_avi_frames,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_avi,
    encode_bmp,
    encode_png,
    encode_wav,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.phash import (
    synth_image,
)

_IMG = synth_image(1, h=24, w=24)
FIXTURES = {
    "bmp": (encode_bmp(_IMG), decode_bmp),
    "png": (encode_png(_IMG), decode_png),
    "jpeg": (encode_jpeg(_IMG, quality=85), decode_jpeg),
    "wav": (encode_wav(synth_clip(1, secs=0.5), 8000), decode_wav),
    "avi": (encode_avi(np.stack([_IMG, _IMG]), codec="dib"), decode_avi_frames),
}

_FUZZ = settings(
    max_examples=150,
    deadline=None,  # cold numpy paths can exceed the default 200 ms
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mutate(payload: bytes, data) -> bytes:
    b = bytearray(payload)
    mode = data.draw(st.integers(0, 2))
    if mode == 0:  # truncate
        return bytes(b[: data.draw(st.integers(0, len(b) - 1))])
    if mode == 1:  # flip bytes
        for _ in range(data.draw(st.integers(1, 8))):
            b[data.draw(st.integers(0, len(b) - 1))] = data.draw(
                st.integers(0, 255)
            )
        return bytes(b)
    pos = data.draw(st.integers(0, len(b) - 1))  # splice
    ins = data.draw(st.binary(min_size=1, max_size=16))
    return bytes(b[:pos]) + ins + bytes(b[pos:])


@pytest.mark.parametrize("fmt", sorted(FIXTURES))
@_FUZZ
@given(data=st.data())
def test_mutated_payloads_hold_the_error_contract(fmt, data):
    payload, dec = FIXTURES[fmt]
    mutated = _mutate(payload, data)
    try:
        dec(mutated)
    except (ValueError, NotImplementedError):
        pass  # the malformed-payload contract


@pytest.mark.parametrize("fmt", sorted(FIXTURES))
@_FUZZ
@given(junk=st.binary(min_size=0, max_size=64))
def test_arbitrary_bytes_hold_the_error_contract(fmt, junk):
    _, dec = FIXTURES[fmt]
    try:
        dec(junk)
    except (ValueError, NotImplementedError):
        pass


def test_dimension_bombs_rejected_fast():
    """Crafted headers declaring huge frames fail as ValueError before
    any allocation — 2^28-pixel cap (r14 fuzz finding: a JPEG SOF is
    16-bit per side, 12.8 GB decoded at the max; BMP/PNG/AVI carry
    32-bit dims)."""
    import struct

    # BMP 60000 x 60000
    hdr = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 60000, 60000, 1, 24, 0, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="pixel cap"):
        decode_bmp(hdr + info + b"\x00" * 64)
    # JPEG SOF0 65500 x 65500
    jpg = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 65500, 65500, 1) + b"\x01\x11\x00"
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="pixel cap"):
        decode_jpeg(jpg)
    # PNG 100000 x 100000 (CRC-correct IHDR so the cap, not the CRC,
    # is what rejects it)
    import zlib as _z

    ihdr = struct.pack(">IIBBBBB", 100000, 100000, 8, 0, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    iend = struct.pack(">I", 0) + b"IEND"
    iend += struct.pack(">I", _z.crc32(b"IEND") & 0xFFFFFFFF)
    png = b"\x89PNG\r\n\x1a\n" + chunk + iend
    with pytest.raises(ValueError, match="pixel cap"):
        decode_png(png)


def test_avi_total_output_and_png_inflate_bounds():
    """Review-found r14 follow-ups: the AVI cap bounds TOTAL output
    (frames x dims — the (n,h,w,3) allocation runs before per-frame
    validation), and PNG decompression is BOUNDED (a DEFLATE bomb
    under a tiny cap-passing header cannot inflate past the declared
    geometry)."""
    import struct
    import zlib as _z

    # AVI: 4096x4096 frames (passes per-frame math) x 32 chunks
    # -> 512M total px > 2^28 cap
    strh_body = b"vids" + b"\x00" * 16 + struct.pack("<II", 1, 10)
    strh = b"strh" + struct.pack("<I", len(strh_body)) + strh_body
    strf_body = struct.pack("<Iii", 40, 4096, 4096) + struct.pack("<HH", 1, 24) + struct.pack("<I", 0) + b"\x00" * 20
    strf = b"strf" + struct.pack("<I", len(strf_body)) + strf_body
    chunks = strh + strf
    for _ in range(32):
        chunks += b"00db" + struct.pack("<I", 0)
    avi = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"AVI " + chunks
    with pytest.raises(ValueError, match="pixel cap"):
        decode_avi_frames(avi)

    # PNG: 8x8 grayscale header, IDAT inflating to ~64 MB
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
        )
    bomb = _z.compress(b"\x00" * (64 << 20), 9)  # ~64 KB compressed
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflates beyond"):
        decode_png(png)


def test_jpeg_intermediate_aware_cap():
    """r15 (r14 ADVICE): JPEG decodes through ~28 B/px of float64 MCU
    planes and coefficient buffers, so its cap is tighter than the
    generic 3 B/px output cap — a 16384x16384 3-component SOF (exactly
    2^28 px, which PASSED the generic cap) must fail fast as a
    malformed-payload ValueError before any allocation."""
    import struct

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.jpeg import (
        MAX_JPEG_DECODE_PIXELS,
    )

    assert 16384 * 16384 > MAX_JPEG_DECODE_PIXELS
    sof_body = struct.pack(">BHHB", 8, 16384, 16384, 3) + (
        b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
    )
    jpg = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="pixel cap"):
        decode_jpeg(jpg)


def test_oversized_payload_error_distinguishes_resource_rejection():
    """r15 ADVICE: an over-cap payload is a RESOURCE rejection, not a
    malformedness diagnosis — all four cap sites raise
    OversizedPayloadError (a ValueError subclass, so quarantine
    semantics are unchanged) and operators can isinstance-test to
    tell a too-big-but-maybe-valid payload from corrupt bytes."""
    import struct

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        OversizedPayloadError,
    )

    assert issubclass(OversizedPayloadError, ValueError)
    sof_body = struct.pack(">BHHB", 8, 16384, 16384, 3) + (
        b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
    )
    jpg = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
        + b"\xff\xd9"
    )
    with pytest.raises(OversizedPayloadError, match="pixel cap"):
        decode_jpeg(jpg)
    # a genuinely malformed payload is NOT the resource class
    with pytest.raises(ValueError) as exc:
        decode_jpeg(b"\xff\xd8\xff\xc0\x00\x04\x00\x00\xff\xd9")
    assert not isinstance(exc.value, OversizedPayloadError)


def test_jpeg_pixel_cap_env_configurable():
    """r15 ADVICE: the JPEG intermediate-memory cap is a deployment
    knob (SPARK_GRAFT_MAX_JPEG_PIXELS), read at import so it
    propagates to Arrow workers through the environment; a raised cap
    admits a SOF the default rejects."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, SPARK_GRAFT_MAX_JPEG_PIXELS=str(1 << 31))
    code = (
        "from sensorstream_scalable_sensor_data_pipeline_spark.operators.jpeg "
        "import MAX_JPEG_DECODE_PIXELS; "
        f"assert MAX_JPEG_DECODE_PIXELS == {1 << 31}, MAX_JPEG_DECODE_PIXELS"
    )
    subprocess.run([sys.executable, "-c", code], check=True, env=env)
