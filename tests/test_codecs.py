"""Real BMP/WAV codecs (operators/codecs.py) and their multimodal
wiring: byte-exact round trips, format edge cases (8-bit palette,
top-down rows, odd widths needing padding, odd-size RIFF chunks),
decode→stats→resize end-to-end through the Arrow mapInPandas stages,
and the honest NotImplementedError scope for other magics."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    resize_nearest,
    sniff_format,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    extract_audio_features,
    extract_features,
    resize_image,
    resize_payloads,
)


def _rgb(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------------ BMP


def test_bmp_rgb_roundtrip_exact():
    for h, w in [(5, 5), (3, 7), (1, 1), (16, 2)]:  # odd widths pad rows
        img = _rgb(h, w, seed=h * 100 + w)
        payload = encode_bmp(img)
        assert sniff_format(payload) == "bmp"
        assert np.array_equal(decode_bmp(payload), img)


def test_bmp_gray_roundtrip_through_palette():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = encode_bmp(g)
    out = decode_bmp(payload)
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out[:, :, 0], g)  # gray palette: equal channels
    assert np.array_equal(out[:, :, 1], g)
    assert np.array_equal(out[:, :, 2], g)


def test_bmp_top_down_rows():
    """Negative height = top-down row order; must decode to the same
    image as the bottom-up encoding of identical pixels."""
    img = _rgb(4, 3)
    payload = bytearray(encode_bmp(img))
    # flip the stored rows, then mark the header top-down
    (offset,) = struct.unpack_from("<I", bytes(payload), 10)
    stride = ((3 * 3) + 3) // 4 * 4
    rows = [
        bytes(payload[offset + i * stride : offset + (i + 1) * stride])
        for i in range(4)
    ]
    payload[offset:] = b"".join(reversed(rows))
    struct.pack_into("<i", payload, 22, -4)
    assert np.array_equal(decode_bmp(bytes(payload)), img)


def test_bmp_rejects_unsupported():
    with pytest.raises(NotImplementedError):
        decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    img = _rgb(2, 2)
    payload = bytearray(encode_bmp(img))
    # RLE8 became SUPPORTED in r13 — but only with 8-bit pixels;
    # method 4 (embedded JPEG) keeps the honest rejection
    struct.pack_into("<I", payload, 30, 1)  # BI_RLE8 on 24-bit pixels
    with pytest.raises(ValueError, match="RLE method"):
        decode_bmp(bytes(payload))
    struct.pack_into("<I", payload, 30, 4)  # BI_JPEG
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(payload))
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(img)[:40])  # truncated


def test_resize_nearest_identity_and_downscale():
    img = _rgb(8, 6)
    assert np.array_equal(resize_nearest(img, 8, 6), img)
    half = resize_nearest(img, 4, 3)
    assert half.shape == (4, 3, 3)
    assert np.array_equal(half, img[::2][:, ::2])  # exact 2× stride


# ------------------------------------------------------------------ WAV


def test_wav_pcm16_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32767, size=500, dtype=np.int16)
    s, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and s.shape == (500, 1)
    assert np.array_equal(s[:, 0], mono)
    stereo = rng.integers(-32768, 32767, size=(250, 2), dtype=np.int16)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and np.array_equal(s2, stereo)


def test_wav_8bit_and_odd_chunk_pad():
    """8-bit PCM lifts to the int16 grid; a chunk walk must skip the
    RIFF pad byte after an odd-sized chunk to find the data chunk."""
    data = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd + pad
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + junk
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    s, rate = decode_wav(payload)
    assert rate == 8000
    assert s[:, 0].tolist() == [(0 - 128) * 256, 0, (255 - 128) * 256]


def test_wav_rejects_non_pcm():
    # format 7 = µ-law: genuinely compressed, honestly rejected
    # (IEEE float — the old fixture here — became SUPPORTED in r13)
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(NotImplementedError):
        decode_wav(b"\xff\xd8 not riff")


# ------------------------------------------- multimodal wiring (real)


def test_decode_image_real_bmp_stats():
    img = _rgb(6, 4)
    payload = encode_bmp(img)
    feats = decode_image(payload)
    assert feats["n_bytes"] == len(payload)
    assert feats["byte_sum"] == int(img.sum(dtype=np.int64))
    assert feats["byte_mean"] == pytest.approx(float(img.mean()))
    assert feats["n_frames"] == 1
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8fake")  # JPEG magic still out of scope


def test_resize_image_real_bmp_fits_budget_and_decodes():
    img = _rgb(64, 48)
    payload = encode_bmp(img)
    target = len(payload) // 4
    out = resize_image(payload, target)
    assert len(out) <= target
    small = decode_bmp(out)  # still a valid BMP
    assert 1 <= small.shape[0] < 64 and 1 <= small.shape[1] < 48
    # within budget → byte-identical pass-through
    assert resize_image(payload, len(payload)) == payload


def test_extract_features_real_codec_end_to_end(spark):
    """The Arrow mapInPandas stage with the REAL decoder: BMP payloads
    in a binary column, per-image pixel stats out."""
    imgs = {i: _rgb(4 + i, 5, seed=i) for i in range(1, 4)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_bmp(im))) for i, im in imgs.items()],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in extract_features(
        df, "doc_id", "payload", fake_decoder=False
    ).collect()}
    assert rows.keys() == imgs.keys()
    for i, im in imgs.items():
        assert rows[i]["byte_sum"] == int(im.sum(dtype=np.int64))
        assert rows[i]["n_frames"] == 1


def test_resize_payloads_real_codec_end_to_end(spark):
    df = spark.createDataFrame(
        [(i, bytearray(encode_bmp(_rgb(32, 32, seed=i)))) for i in range(3)],
        "doc_id long, payload binary",
    )
    target = 1024
    out = resize_payloads(df, "doc_id", "payload", target, fake_codec=False)
    for r in out.collect():
        assert r["n_bytes"] == len(r["payload"]) <= target
        assert decode_bmp(bytes(r["payload"])).ndim == 3


def test_extract_audio_features_end_to_end(spark):
    rng = np.random.default_rng(5)
    clips = {
        1: (rng.integers(-1000, 1000, size=1600, dtype=np.int16), 16000),
        2: (rng.integers(-32000, 32000, size=(400, 2), dtype=np.int16), 8000),
    }
    df = spark.createDataFrame(
        [(i, bytearray(encode_wav(s, r))) for i, (s, r) in clips.items()],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in extract_audio_features(
        df, "doc_id", "payload"
    ).collect()}
    assert rows[1]["sample_rate"] == 16000 and rows[1]["n_channels"] == 1
    assert rows[1]["duration_s"] == pytest.approx(0.1)
    assert rows[2]["sample_rate"] == 8000 and rows[2]["n_channels"] == 2
    s2 = clips[2][0].astype(np.float64)
    assert rows[2]["rms"] == pytest.approx(float(np.sqrt((s2 * s2).mean())))
    assert rows[2]["peak"] == int(np.abs(clips[2][0]).max())
    with pytest.raises(NotImplementedError):
        decode_audio(b"BM not a wav")


def test_decode_audio_peak_full_scale_negative():
    # np.abs(int16(-32768)) overflows back to -32768; the peak must be
    # computed on a widened dtype so a full-scale negative sample wins
    samples = np.array([-32768, 100, -5], dtype=np.int16)
    feats = decode_audio(encode_wav(samples, 8000))
    assert feats["peak"] == 32768


# ------------------------------------------------------------------ AVI


def _frames(n, h, w, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_avi_roundtrip_exact_and_fps():
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        decode_avi_frames,
        encode_avi,
    )

    for n, h, w in [(5, 4, 6), (3, 5, 7), (1, 1, 1)]:  # odd widths pad rows
        frames = _frames(n, h, w, seed=n * 100 + w)
        payload = encode_avi(frames, fps=12)
        assert sniff_format(payload) == "avi"
        out, fps = decode_avi_frames(payload)
        assert np.array_equal(out, frames)
        assert fps == 12.0


def test_avi_zero_frames_clear_error_both_codecs():
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        encode_avi,
    )

    empty = np.zeros((0, 4, 4, 3), dtype=np.uint8)
    for codec in ("dib", "mjpg"):
        with pytest.raises(ValueError, match="at least one frame"):
            encode_avi(empty, fps=10, codec=codec)


def test_avi_rejects_compressed_and_non_avi():
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        decode_avi_frames,
        encode_avi,
    )

    with pytest.raises(NotImplementedError):
        decode_avi_frames(b"\x00\x00\x00 ftypisom" + b"\x00" * 32)  # MP4 magic
    payload = bytearray(encode_avi(_frames(2, 4, 4), fps=5))
    # flip strf biCompression to H264 (MJPG is supported since r9)
    i = bytes(payload).find(b"strf")
    payload[i + 8 + 16 : i + 8 + 20] = b"H264"
    with pytest.raises(NotImplementedError):
        decode_avi_frames(bytes(payload))


def test_sample_frames_real_avi_end_to_end(spark):
    """The fan-out mapInPandas stage with the REAL framer: AVI
    payloads in, every_n-th frame out as standalone BMPs that feed
    straight back into decode_image (the frame → thumbnail compose)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        encode_avi,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.multimodal import (
        sample_frames,
    )

    vids = {1: _frames(6, 4, 5, seed=1), 2: _frames(3, 4, 5, seed=2)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_avi(f, fps=10))) for i, f in vids.items()],
        "doc_id long, payload binary",
    )
    rows = sample_frames(df, "doc_id", "payload", every_n=2, fake_codec=False).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = bytes(r["frame"])
    assert {d: sorted(fs) for d, fs in by_doc.items()} == {1: [0, 2, 4], 2: [0, 2]}
    for d, fs in by_doc.items():
        for fi, bmp_bytes in fs.items():
            assert np.array_equal(decode_bmp(bmp_bytes), vids[d][fi])
    # non-AVI magic still honestly out of scope on the real path
    bad = spark.createDataFrame([(9, bytearray(b"\xff\xd8 not avi"))],
                                "doc_id long, payload binary")
    with pytest.raises(Exception):
        sample_frames(bad, "doc_id", "payload", every_n=2, fake_codec=False).collect()


def test_avi_top_down_height_sign():
    """Negative strf height = top-down frame rows (DIB convention,
    same as BMP) — must decode unmirrored, not silently flipped."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        decode_avi_frames,
        encode_avi,
    )

    frames = _frames(2, 4, 3, seed=9)
    payload = bytearray(encode_avi(frames, fps=5))
    # flip stored rows of each frame, then mark strf height negative
    i = bytes(payload).find(b"strf")
    (w,) = struct.unpack_from("<i", payload, i + 8 + 4)
    (h,) = struct.unpack_from("<i", payload, i + 8 + 8)
    struct.pack_into("<i", payload, i + 8 + 8, -h)
    stride = ((w * 3) + 3) // 4 * 4
    pos = 0
    while True:
        j = bytes(payload).find(b"00db", pos)
        if j < 0:
            break
        body = j + 8
        rows = [
            bytes(payload[body + r * stride : body + (r + 1) * stride])
            for r in range(h)
        ]
        payload[body : body + stride * h] = b"".join(reversed(rows))
        pos = body + stride * h
    out, _ = decode_avi_frames(bytes(payload))
    assert np.array_equal(out, frames)


def _smooth_frames(n, h, w):
    """JPEG-friendly gradient frames (noise compresses terribly under
    4:2:0; MJPEG fidelity pins use smooth content like real video)."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.stack(
                [(yy * 3 + i * 11) % 256, (xx * 3) % 256, (yy + xx + i) % 256],
                -1,
            )
            for i in range(n)
        ]
    ).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_avi_mjpeg_roundtrip_psnr_and_fps():
    """codec='mjpg': one baseline 4:2:0 JPEG per ##dc chunk; decode
    recovers shape/fps exactly and pixels to a JPEG-lossy PSNR floor."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        decode_avi_frames,
        encode_avi,
    )

    frames = _smooth_frames(4, 12, 17)  # non-multiple-of-8 dims
    payload = encode_avi(frames, fps=24, codec="mjpg", quality=95)
    assert sniff_format(payload) == "avi"
    out, fps = decode_avi_frames(payload)
    assert out.shape == frames.shape and fps == 24.0
    for i in range(frames.shape[0]):
        assert _psnr(out[i], frames[i]) > 30.0
    # deterministic bytes, and visibly smaller than uncompressed DIB
    assert payload == encode_avi(frames, fps=24, codec="mjpg", quality=95)
    big = _smooth_frames(4, 64, 64)
    assert len(encode_avi(big, codec="mjpg")) < len(encode_avi(big))


def _strip_dht(jpeg: bytes) -> bytes:
    """Drop every DHT segment from a JPEG stream (the OpenDML MJPEG
    wire shape: frames carry no Huffman tables)."""
    out = bytearray(jpeg[:2])
    pos = 2
    while pos + 4 <= len(jpeg):
        marker = jpeg[pos + 1]
        if marker == 0xDA:  # SOS: copy the rest verbatim
            out += jpeg[pos:]
            return bytes(out)
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker != 0xC4:
            out += jpeg[pos : pos + 2 + seglen]
        pos += 2 + seglen
    raise AssertionError("no SOS in test JPEG")


def test_avi_mjpeg_dht_less_frames_use_standard_tables():
    """Hand-built MJPG container (independent of encode_avi) whose
    GRAYSCALE frames have their DHT segments stripped — the decoder
    must apply the Annex-K default tables (OpenDML convention) and
    broadcast gray to RGB; result equals decoding the un-stripped
    JPEG directly."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        decode_avi_frames,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    h, w = 9, 13
    yy, xx = np.mgrid[0:h, 0:w]
    gray = [(yy * 7 + xx * 5 + i) % 256 for i in range(3)]
    jpegs = [encode_jpeg(g.astype(np.uint8), quality=90) for g in gray]
    stripped = [_strip_dht(j) for j in jpegs]
    assert all(len(s) < len(j) for s, j in zip(stripped, jpegs))

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + b"\x00" * (len(body) & 1)

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<14I", 100_000, 0, 0, 0x10, 3, 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, 10, 0, 3, 0, -1, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH", 40, w, h, 1, 24) + b"MJPG" + struct.pack(
        "<IiiII", 0, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", s) for s in stripped))
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    out, fps = decode_avi_frames(payload)
    assert out.shape == (3, h, w, 3) and fps == 10.0
    for i, j in enumerate(jpegs):
        direct = decode_jpeg(j)  # tables present: no default needed
        assert np.array_equal(out[i], np.stack([direct] * 3, -1))


def test_avi_mjpeg_frame_dim_mismatch_raises():
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        decode_avi_frames,
        encode_avi,
    )

    payload = bytearray(encode_avi(_smooth_frames(2, 8, 8), codec="mjpg"))
    i = bytes(payload).find(b"strf")
    struct.pack_into("<i", payload, i + 8 + 4, 9)  # lie about width
    with pytest.raises(ValueError):
        decode_avi_frames(bytes(payload))


def test_sample_frames_real_mjpeg_avi_end_to_end(spark):
    """The REAL framer over a COMPRESSED container: MJPG AVI in,
    sampled frames out as BMPs whose pixels match the source to a
    JPEG PSNR floor (the full decode→re-encode compose)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        encode_avi,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.multimodal import (
        sample_frames,
    )

    vids = {1: _smooth_frames(5, 16, 16), 2: _smooth_frames(2, 16, 16)}
    df = spark.createDataFrame(
        [
            (i, bytearray(encode_avi(f, fps=10, codec="mjpg", quality=95)))
            for i, f in vids.items()
        ],
        "doc_id long, payload binary",
    )
    rows = sample_frames(df, "doc_id", "payload", every_n=2, fake_codec=False).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = bytes(r["frame"])
    assert {d: sorted(fs) for d, fs in by_doc.items()} == {1: [0, 2, 4], 2: [0]}
    for d, fs in by_doc.items():
        for fi, bmp_bytes in fs.items():
            assert _psnr(decode_bmp(bmp_bytes), vids[d][fi]) > 30.0


def test_bmp_palette_index_out_of_range_raises_valueerror():
    """A malformed 8-bit BMP whose pixels index past biClrUsed must
    raise the module's ValueError contract, not a numpy IndexError."""
    g = np.full((4, 4), 200, dtype=np.uint8)
    payload = bytearray(encode_bmp(g))
    struct.pack_into("<I", payload, 46, 16)  # declare a 16-entry palette
    with pytest.raises(ValueError, match="palette"):
        decode_bmp(bytes(payload))


# ------------------------------------------------------------------ PNG

from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (  # noqa: E402
    decode_png,
    encode_png,
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _forward_filter(img: np.ndarray, filters: list[int]) -> bytes:
    """Independent forward filtering (spec equations, not the codec's
    inverse): builds the raw scanline stream for the given per-row
    filter types."""
    h, rowbytes = img.shape[0], img.shape[1] * (img.shape[2] if img.ndim == 3 else 1)
    flat = img.reshape(h, rowbytes).astype(np.int64)
    bpp = img.shape[2] if img.ndim == 3 else 1
    out = bytearray()
    prev = np.zeros(rowbytes, dtype=np.int64)
    for y, f in enumerate(filters):
        cur = flat[y]
        enc = np.zeros(rowbytes, dtype=np.int64)
        for i in range(rowbytes):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (cur[i] - pred) & 0xFF
        out += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = cur
    return bytes(out)


def _build_png(img: np.ndarray, filters: list[int], color_type: int,
               extra: list[tuple[bytes, bytes]] | None = None,
               split_idat: bool = False) -> bytes:
    """Hand-assemble a PNG from spec primitives — fully independent of
    encode_png, so decode tests are adversarial, not circular."""
    import zlib

    h = img.shape[0]
    w = img.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    comp = zlib.compress(_forward_filter(img, filters), 9)
    parts = [_PNG_SIG, _chunk(b"IHDR", ihdr)]
    for ctype, data in extra or []:
        parts.append(_chunk(ctype, data))
    if split_idat:
        mid = len(comp) // 2
        parts += [_chunk(b"IDAT", comp[:mid]), _chunk(b"IDAT", comp[mid:])]
    else:
        parts.append(_chunk(b"IDAT", comp))
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)


def test_png_roundtrip_exact_all_color_types():
    rng = np.random.default_rng(11)
    shapes = {
        "gray": (9, 7),
        "gray_alpha": (5, 6, 2),
        "rgb": (8, 3, 3),
        "rgba": (4, 4, 4),
    }
    for name, shape in shapes.items():
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        payload = encode_png(img)
        assert sniff_format(payload) == "png", name
        assert np.array_equal(decode_png(payload), img), name


def test_png_every_filter_type_decodes():
    """Each of the five scanline filters, exercised per-row on a
    hand-assembled payload (forward filtering implemented from the
    spec in this test, not by the codec)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    payload = _build_png(img, [0, 1, 2, 3, 4], color_type=2)
    assert np.array_equal(decode_png(payload), img)
    # filters that reference the row above, on the FIRST row (prev=0)
    for f in (2, 3, 4):
        one = rng.integers(0, 256, size=(1, 4, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(_build_png(one, [f], 2)), one)


def test_png_gray_and_alpha_filtered():
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    assert np.array_equal(
        decode_png(_build_png(g[..., None], [1, 4, 3, 2], color_type=0)), g
    )
    ga = rng.integers(0, 256, size=(3, 4, 2), dtype=np.uint8)
    assert np.array_equal(decode_png(_build_png(ga, [4, 4, 4], color_type=4)), ga)


def test_png_paletted_decode():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    payload = _build_png(
        idx[..., None], [0, 1], color_type=3, extra=[(b"PLTE", pal.tobytes())]
    )
    assert np.array_equal(decode_png(payload), pal[idx])


def test_png_multi_idat_concatenation():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    payload = _build_png(img, [2] * 16, color_type=2, split_idat=True)
    assert np.array_equal(decode_png(payload), img)


def test_png_rejections():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = _build_png(img, [0, 0], color_type=2)
    # not a PNG
    with pytest.raises(NotImplementedError, match="signature"):
        decode_png(b"\xff\xd8\xff\xe0jpegish")
    # sub-byte truecolor is illegal per spec (sub-byte gray/palette
    # DECODE since r10 — see the sub-byte tests)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    depth4rgb = _PNG_SIG + _chunk(b"IHDR", ihdr) + good[len(_PNG_SIG) + 25:]
    with pytest.raises(ValueError, match="invalid for PNG color type"):
        decode_png(depth4rgb)
    # tRNS combined with an alpha channel is illegal per spec
    rgba = np.zeros((1, 1, 4), np.uint8)
    bad_trns = _build_png(
        rgba, [0], color_type=6, extra=[(b"tRNS", b"\x00\x00")]
    )
    with pytest.raises(ValueError, match="alpha channel"):
        decode_png(bad_trns)
    # color-key tRNS of the wrong byte length
    ckey_short = _build_png(
        img, [0, 0], color_type=2, extra=[(b"tRNS", b"\x00\x00")]
    )
    with pytest.raises(ValueError, match="color-key tRNS must be 6 bytes"):
        decode_png(ckey_short)
    # CRC corruption -> ValueError (integrity, not scope)
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # palette index out of range
    pal = b"\x00\x00\x00\xff\xff\xff"
    oob = _build_png(
        np.array([[5]], np.uint8)[..., None], [0], 3, extra=[(b"PLTE", pal)]
    )
    with pytest.raises(ValueError, match="palette"):
        decode_png(oob)
    # 16-bit paletted is invalid per spec (not a scope gap)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    pal16 = (
        _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal)
        + good[len(_PNG_SIG) + 25:]
    )
    with pytest.raises(ValueError, match="invalid for PNG color type 3"):
        decode_png(pal16)
    # tRNS longer than the palette
    overlong = _build_png(
        np.zeros((1, 2, 1), np.uint8), [0], 3,
        extra=[(b"PLTE", pal), (b"tRNS", b"\x80" * 3)],
    )
    with pytest.raises(ValueError, match="tRNS"):
        decode_png(overlong)
    # truncated pixel stream
    short = _build_png(np.zeros((3, 3, 3), np.uint8), [0, 0], color_type=2)
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(short)


def test_png_16bit_roundtrip_and_byte_order():
    """16-bit PNGs round-trip exactly at every color type, and the
    sample order on the wire is network (big-endian) per spec —
    pinned by decoding a hand-assembled single-pixel payload."""
    import zlib

    rng = np.random.default_rng(21)
    for shape in ((5, 4), (3, 5, 2), (4, 3, 3), (2, 2, 4)):
        img = rng.integers(0, 65536, size=shape, dtype=np.uint16)
        out = decode_png(encode_png(img))
        assert out.dtype == np.uint16, shape
        assert np.array_equal(out, img), shape
    # hand-built 1x1 gray, depth 16, filter 0, bytes 0x01 0x02 -> 0x0102
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00\x01\x02")
    payload = (
        _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
    assert decode_png(payload)[0, 0] == 0x0102


def test_png_adam7_roundtrip_all_pass_edges():
    """Adam7 decode == the source pixels for sizes that exercise the
    pass-grid edges: images small enough that later passes are empty
    (1x1 has ONE pass), non-multiples of 8, and both depths."""
    rng = np.random.default_rng(22)
    for shape in ((1, 1), (3, 3, 3), (8, 8, 3), (10, 7, 4), (5, 13)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        payload = encode_png(img, interlace=True)
        # header declares Adam7
        assert payload[8 + 8 + 12] == 1
        assert np.array_equal(decode_png(payload), img), shape
        # interlaced and sequential encodes of the same pixels decode
        # identically
        assert np.array_equal(decode_png(encode_png(img)), img), shape
    img16 = rng.integers(0, 65536, size=(9, 6, 3), dtype=np.uint16)
    assert np.array_equal(decode_png(encode_png(img16, interlace=True)), img16)


def test_png_adam7_filtered_passes_decode():
    """Each Adam7 pass is independently filtered: a hand-assembled
    interlaced payload whose passes use different filter types (with
    prev reset per pass) must decode exactly."""
    import zlib

    rng = np.random.default_rng(23)
    h, w, ch = 9, 10, 3
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    grids = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    stream = bytearray()
    fcycle = [0, 1, 2, 3, 4, 1, 2]
    for (x0, y0, xs, ys), f in zip(grids, fcycle):
        sub = img[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        stream += _forward_filter(sub, [f] * sub.shape[0])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    payload = (
        _PNG_SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(stream)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)


def _pack_subbyte(vals: np.ndarray, depth: int) -> np.ndarray:
    """(h, w) sample values → (h, rowbytes) spec bit packing
    (MSB-first within each byte, rows padded to a byte boundary) —
    spec-side forward packing implemented in the test, not by the
    codec."""
    h, w = vals.shape
    bits = ((vals[..., None] >> np.arange(depth - 1, -1, -1)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(h, w * depth), axis=1)


def _build_subbyte_png(
    vals: np.ndarray, depth: int, color_type: int, extra=None
) -> bytes:
    import zlib

    h, w = vals.shape
    packed = _pack_subbyte(vals, depth)
    scan = np.zeros((h, 1 + packed.shape[1]), dtype=np.uint8)
    scan[:, 1:] = packed  # filter 0 per row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    parts = [_PNG_SIG, _chunk(b"IHDR", ihdr)]
    for ctype, data in extra or []:
        parts.append(_chunk(ctype, data))
    parts.append(_chunk(b"IDAT", zlib.compress(scan.tobytes())))
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)


def test_png_subbyte_gray_decodes_and_scales():
    """1/2/4-bit grayscale: samples unpack MSB-first and scale to the
    8-bit range by the exact 255/(2^d−1) replication factor; odd
    widths exercise the row-padding bits."""
    rng = np.random.default_rng(31)
    for depth in (1, 2, 4):
        hi = (1 << depth) - 1
        vals = rng.integers(0, hi + 1, size=(5, 7), dtype=np.uint8)  # odd w
        out = decode_png(_build_subbyte_png(vals, depth, color_type=0))
        assert out.shape == (5, 7), depth
        assert np.array_equal(out, vals * (255 // hi)), depth


def test_png_subbyte_palette_decodes():
    """4-bit paletted (the GIF-era form): indices unpack unscaled and
    map through PLTE; 1-bit palette (mask form) too."""
    pal = np.array(
        [[9, 8, 7], [1, 2, 3], [4, 5, 6], [250, 251, 252]], np.uint8
    )
    idx4 = np.array([[0, 1, 2], [3, 0, 2]], dtype=np.uint8)
    out = decode_png(
        _build_subbyte_png(idx4, 4, color_type=3, extra=[(b"PLTE", pal.tobytes())])
    )
    assert np.array_equal(out, pal[idx4])
    idx1 = np.array([[0, 1, 1, 0, 1]], dtype=np.uint8)
    out1 = decode_png(
        _build_subbyte_png(
            idx1, 1, color_type=3, extra=[(b"PLTE", pal[:2].tobytes())]
        )
    )
    assert np.array_equal(out1, pal[:2][idx1])


def test_png_subbyte_adam7():
    """Sub-byte depths compose with Adam7: each pass's scanlines pack
    independently to their own byte boundary."""
    import zlib

    rng = np.random.default_rng(32)
    h, w, depth = 9, 10, 2
    vals = rng.integers(0, 4, size=(h, w), dtype=np.uint8)
    grids = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    stream = bytearray()
    for x0, y0, xs, ys in grids:
        sub = vals[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        packed = _pack_subbyte(np.ascontiguousarray(sub), depth)
        scan = np.zeros((sub.shape[0], 1 + packed.shape[1]), dtype=np.uint8)
        scan[:, 1:] = packed
        stream += scan.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 1)
    payload = (
        _PNG_SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(stream)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), vals * 85)


def test_png_color_key_trns():
    """Gray and RGB color-key transparency: pixels equal to the key
    sample(s) get alpha 0, everything else full alpha; the key
    matches in the original sample space (16-bit too)."""
    # gray 8-bit, key = 7
    g = np.array([[7, 8], [9, 7]], dtype=np.uint8)
    payload = _build_png(
        g[..., None], [0, 0], color_type=0,
        extra=[(b"tRNS", struct.pack(">H", 7))],
    )
    out = decode_png(payload)
    assert out.shape == (2, 2, 2)
    assert np.array_equal(out[..., 0], g)
    assert np.array_equal(out[..., 1], np.array([[0, 255], [255, 0]], np.uint8))
    # RGB 8-bit: ONLY the exact triple matches
    img = np.array(
        [[[1, 2, 3], [1, 2, 4]], [[9, 2, 3], [1, 2, 3]]], dtype=np.uint8
    )
    payload = _build_png(
        img, [0, 0], color_type=2,
        extra=[(b"tRNS", struct.pack(">HHH", 1, 2, 3))],
    )
    out = decode_png(payload)
    assert out.shape == (2, 2, 4)
    assert np.array_equal(out[..., :3], img)
    assert np.array_equal(out[..., 3], np.array([[0, 255], [255, 0]], np.uint8))
    # 16-bit gray: alpha is full-scale uint16
    g16 = np.array([[300, 301]], dtype=np.uint16)
    payload = encode_png(g16)
    # splice a tRNS chunk in before IDAT
    sig_ihdr = payload[: 8 + 25]
    rest = payload[8 + 25 :]
    keyed = sig_ihdr + _chunk(b"tRNS", struct.pack(">H", 300)) + rest
    out = decode_png(keyed)
    assert out.dtype == np.uint16 and out.shape == (1, 2, 2)
    assert np.array_equal(out[..., 1], np.array([[0, 65535]], np.uint16))


def test_png_palette_trns_alpha():
    """Paletted PNG with tRNS decodes to RGBA; alpha entries beyond
    the tRNS table default to 255 (opaque) per spec."""
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    payload = _build_png(
        idx[..., None], [0, 1], color_type=3,
        extra=[(b"PLTE", pal.tobytes()), (b"tRNS", b"\x00\x80")],
    )
    out = decode_png(payload)
    assert out.shape == (2, 3, 4)
    assert np.array_equal(out[..., :3], pal[idx])
    alpha = np.array([0, 128, 255], np.uint8)
    assert np.array_equal(out[..., 3], alpha[idx])


def test_decode_image_real_png_stats():
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    payload = encode_png(img)
    feats = decode_image(payload)
    assert feats["n_bytes"] == len(payload)
    assert feats["byte_sum"] == int(img.sum(dtype=np.int64))
    assert feats["byte_mean"] == pytest.approx(float(img.mean()))
    assert feats["n_frames"] == 1


def test_resize_image_real_png_fits_budget_and_decodes():
    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8)
    payload = encode_png(img)
    target = len(payload) // 4
    out = resize_image(payload, target)
    assert sniff_format(out) == "png"
    assert len(out) <= target
    small = decode_png(out)
    assert 1 <= small.shape[0] < 64 and 1 <= small.shape[1] < 48
    assert resize_image(payload, len(payload)) == payload  # pass-through


def test_extract_features_mixed_bmp_png_end_to_end(spark):
    """The REAL decoder dispatches per payload inside one Arrow batch:
    BMP and PNG documents mixed in the same binary column."""
    rng = np.random.default_rng(23)
    imgs = {i: rng.integers(0, 256, size=(4 + i, 5, 3), dtype=np.uint8)
            for i in range(1, 5)}
    rows = [
        (i, bytearray(encode_bmp(im) if i % 2 else encode_png(im)))
        for i, im in imgs.items()
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in extract_features(
        df, "doc_id", "payload", fake_decoder=False
    ).collect()}
    assert got.keys() == imgs.keys()
    for i, im in imgs.items():
        assert got[i]["byte_sum"] == int(im.sum(dtype=np.int64))


def test_png_missing_or_corrupt_idat_raises_valueerror():
    """An empty/corrupt IDAT stream must raise the module's
    ValueError contract, not a raw zlib.error from an executor."""
    import zlib as _zlib

    no_idat = (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT"):
        decode_png(no_idat)
    # IEND never arrives -> truncated-stream contract
    with pytest.raises(ValueError, match="IEND"):
        decode_png(encode_png(np.zeros((2, 2, 3), np.uint8))[:-12])


def _bmp_header(w, h, bitcount, n_colors, stride):
    data_offset = 14 + 40 + n_colors * 4
    pixel_bytes = stride * h
    hdr = struct.pack(
        "<2sIHHI", b"BM", data_offset + pixel_bytes, 0, 0, data_offset
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bitcount, 0, pixel_bytes,
        2835, 2835, n_colors, 0,
    )
    return hdr + info


def test_bmp_32bit_bgrx():
    """32-bit BI_RGB (r13): BGRX words, the X byte discarded."""
    rows = bytes(
        [10, 20, 30, 0xAA, 40, 50, 60, 0xBB]   # bottom row (stored first)
        + [1, 2, 3, 0xCC, 4, 5, 6, 0xDD]
    )
    img = decode_bmp(_bmp_header(2, 2, 32, 0, 8) + rows)
    assert img.shape == (2, 2, 3)
    # bottom-up: stored-first row is the IMAGE's last row
    assert img[1, 0].tolist() == [30, 20, 10] and img[1, 1].tolist() == [60, 50, 40]
    assert img[0, 0].tolist() == [3, 2, 1] and img[0, 1].tolist() == [6, 5, 4]


def test_bmp_16bit_x1r5g5b5_scaling():
    """16-bit (r13): 5-bit channels scale by the exact v<<3 | v>>2
    replication — 0 -> 0, 31 -> 255, 10 -> 82."""
    px = [
        (31 << 10) | (0 << 5) | 10,   # R=31, G=0, B=10
        (10 << 10) | (31 << 5) | 0,   # R=10, G=31, B=0
    ]
    rows = struct.pack("<2H", *px)  # one row, stride exactly 4
    img = decode_bmp(_bmp_header(2, 1, 16, 0, 4) + rows)
    assert img[0, 0].tolist() == [255, 0, 82]
    assert img[0, 1].tolist() == [82, 255, 0]


def test_bmp_4bit_palette_odd_width():
    """4-bit palette (r13): MSB-first nibbles, odd width leaves
    padding bits that must be discarded."""
    pal = bytes(bytearray(v for i in range(16) for v in (i, i * 2 % 256, i * 3 % 256, 0)))
    # one row, 3 px wide: indices 1, 15, 2 -> bytes 0x1F, 0x20, pad to 4
    rows = bytes([0x1F, 0x20, 0, 0])
    img = decode_bmp(_bmp_header(3, 1, 4, 16, 4) + pal + rows)
    # palette entry i is BGRA (i, 2i, 3i, 0) -> RGB (3i, 2i, i)
    assert img[0, 0].tolist() == [3, 2, 1]
    assert img[0, 1].tolist() == [45, 30, 15]
    assert img[0, 2].tolist() == [6, 4, 2]


def test_bmp_1bit_stride_edge():
    """1-bit palette at w=33 (r13): the bit-exact stride formula
    gives 8 bytes/row where the old byte-first one computed 4."""
    pal = bytes(bytearray([0, 0, 0, 0, 255, 255, 255, 0]))  # black, white
    # 33 px: first byte 0b10101010..., 33rd pixel = 1 in bit 7 of byte 5
    row = bytes([0b10000001, 0, 0, 0, 0b10000000, 0, 0, 0])
    img = decode_bmp(_bmp_header(33, 1, 1, 2, 8) + pal + row)
    assert img.shape == (1, 33, 3)
    assert img[0, 0].tolist() == [255, 255, 255]   # bit 7 of byte 0
    assert img[0, 7].tolist() == [255, 255, 255]   # bit 0 of byte 0
    assert img[0, 1].tolist() == [0, 0, 0]
    assert img[0, 32].tolist() == [255, 255, 255]  # first bit of byte 4


def test_bmp_illegal_depth_is_valueerror():
    """Depths outside the BI_RGB legal set are malformed files now,
    not format gaps."""
    with pytest.raises(ValueError, match="not a legal BI_RGB depth"):
        decode_bmp(_bmp_header(2, 1, 13, 0, 4) + b"\x00" * 4)


def _wav_fixture(fmt_code, bits, data, n_channels=1, rate=8000, extensible=False):
    if extensible:
        ext = struct.pack("<HHI", 22, bits, 0xF) + struct.pack("<H", fmt_code) + b"\x00" * 14
        fmt_body = struct.pack(
            "<HHIIHH", 0xFFFE, n_channels, rate,
            rate * n_channels * bits // 8, n_channels * bits // 8, bits,
        ) + ext
    else:
        fmt_body = struct.pack(
            "<HHIIHH", fmt_code, n_channels, rate,
            rate * n_channels * bits // 8, n_channels * bits // 8, bits,
        )
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if len(fmt_body) & 1:
        chunks += b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_24bit_pcm_truncates_to_int16_grid():
    """24-bit PCM (r13): top 16 bits survive, sign preserved."""
    samples = [0x123456, -0x123456, 0x7FFFFF, -0x800000]
    data = b"".join(
        int(s & 0xFFFFFF).to_bytes(3, "little") for s in samples
    )
    out, rate = decode_wav(_wav_fixture(1, 24, data))
    assert rate == 8000
    assert out[:, 0].tolist() == [0x1234, -0x1235, 0x7FFF, -0x8000]


def test_wav_32bit_int_and_float():
    """32-bit integer PCM shifts to the int16 grid; IEEE float
    (format 3) clips to [-1, 1] and scales by 32767."""
    ints = np.array([0x12345678, -0x12345678], dtype="<i4")
    out, _ = decode_wav(_wav_fixture(1, 32, ints.tobytes()))
    assert out[:, 0].tolist() == [0x1234, -4661]  # arithmetic >> 16
    floats = np.array([0.5, -1.0, 2.0, -3.0], dtype="<f4")
    out, _ = decode_wav(_wav_fixture(3, 32, floats.tobytes()))
    assert out[:, 0].tolist() == [16384, -32767, 32767, -32768]
    floats64 = np.array([0.25], dtype="<f8")
    out, _ = decode_wav(_wav_fixture(3, 64, floats64.tobytes()))
    assert out[0, 0] == 8192


def test_wav_float_nonfinite_samples_rejected():
    """NaN survives np.clip and hits an undefined float->int16 cast
    (r13 ADVICE) — non-finite IEEE-float samples are a malformed
    payload, rejected deterministically instead of yielding
    platform-dependent fingerprints. Infinities clip fine on their
    own but share the contract: one rule, no silent half-support."""
    for bad in (np.nan, np.inf, -np.inf):
        floats = np.array([0.5, bad], dtype="<f4")
        with pytest.raises(ValueError, match="non-finite"):
            decode_wav(_wav_fixture(3, 32, floats.tobytes()))
    floats64 = np.array([np.nan], dtype="<f8")
    with pytest.raises(ValueError, match="non-finite"):
        decode_wav(_wav_fixture(3, 64, floats64.tobytes()))


def test_wav_extensible_resolves_subformat():
    """WAVE_FORMAT_EXTENSIBLE (r13): the SubFormat GUID's leading
    code routes to the same PCM decode; a non-PCM sub-code keeps the
    honest rejection."""
    ints = np.array([1000, -1000], dtype="<i2")
    out, _ = decode_wav(_wav_fixture(1, 16, ints.tobytes(), extensible=True))
    assert out[:, 0].tolist() == [1000, -1000]
    with pytest.raises(NotImplementedError, match="format 2"):
        decode_wav(_wav_fixture(2, 16, ints.tobytes(), extensible=True))


def _bmp_bitfields(w, h, bitcount, masks, rows):
    data_offset = 14 + 40 + 12
    hdr = struct.pack("<2sIHHI", b"BM", data_offset + len(rows), 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bitcount, 3, len(rows), 2835, 2835, 0, 0
    )
    return hdr + info + struct.pack("<III", *masks) + rows


def test_bmp_bitfields_565_and_32bit():
    """BI_BITFIELDS (r13): 565 16-bit (the common Windows form) and a
    32-bit 8-8-8 mask layout, channels scaled by the exact max->255
    rule."""
    # one row, two px: R=31,G=0,B=16 and R=0,G=63,B=0
    px = [(31 << 11) | (0 << 5) | 16, (0 << 11) | (63 << 5) | 0]
    rows = struct.pack("<2H", *px)
    img = decode_bmp(
        _bmp_bitfields(2, 1, 16, (0xF800, 0x07E0, 0x001F), rows)
    )
    assert img[0, 0].tolist() == [255, 0, (16 * 255) // 31]
    assert img[0, 1].tolist() == [0, 255, 0]
    # 32-bit masks in non-BGRX order: R in byte 0, G byte 1, B byte 2
    rows32 = struct.pack("<2I", 0x00302010, 0x00605040)
    img = decode_bmp(
        _bmp_bitfields(2, 1, 32, (0x000000FF, 0x0000FF00, 0x00FF0000), rows32)
    )
    assert img[0, 0].tolist() == [0x10, 0x20, 0x30]
    assert img[0, 1].tolist() == [0x40, 0x50, 0x60]


def _bmp_rle(w, h, bitcount, n_colors, pal, stream):
    data_offset = 14 + 40 + n_colors * 4
    hdr = struct.pack("<2sIHHI", b"BM", data_offset + len(stream), 0, 0, data_offset)
    comp = 1 if bitcount == 8 else 2
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bitcount, comp, len(stream),
        2835, 2835, n_colors, 0,
    )
    return hdr + info + pal + stream


def test_bmp_rle8_runs_absolute_delta():
    """BI_RLE8 (r13): encoded runs, an absolute block (2-byte
    aligned), a delta skip (skipped pixels stay index 0), EOL and
    EOB."""
    pal = bytes(bytearray(v for i in range(4) for v in (i * 10, i * 20, i * 30, 0)))
    stream = bytes(
        [3, 1]                 # run: 3 x idx1
        + [0, 3, 2, 3, 0, 0]   # absolute: idx2, idx3, idx0 + PAD byte
        + [0, 0]               # EOL
        + [0, 2, 2, 0]         # delta: skip 2 px on row 1
        + [2, 2]               # run: 2 x idx2
        + [0, 1]               # EOB
    )
    img = decode_bmp(_bmp_rle(6, 2, 8, 4, pal, stream))
    # stored row 0 is the image BOTTOM row
    bottom, top = img[1], img[0]
    # palette entry i = BGRA (10i, 20i, 30i) -> RGB (30i, 20i, 10i)
    assert [list(p) for p in bottom] == [
        [30, 20, 10], [30, 20, 10], [30, 20, 10],
        [60, 40, 20], [90, 60, 30], [0, 0, 0],
    ]
    assert [list(p) for p in top] == [
        [0, 0, 0], [0, 0, 0], [60, 40, 20], [60, 40, 20],
        [0, 0, 0], [0, 0, 0],
    ]


def test_bmp_rle4_nibble_runs():
    """BI_RLE4 (r13): a run alternates the byte's two nibbles."""
    pal = bytes(bytearray(v for i in range(16) for v in (i, i, i, 0)))
    stream = bytes([5, 0x12, 0, 1])  # run of 5 alternating 1,2,1,2,1 + EOB
    img = decode_bmp(_bmp_rle(5, 1, 4, 16, pal, stream))
    assert [p[0] for p in img[0]] == [1, 2, 1, 2, 1]


def test_bmp_rle8_overflow_run_is_clipped_not_crash():
    """A malformed RLE run starting past the row width writes nothing
    (review-found: the first cut assigned a negative-length slice and
    raised a numpy broadcast error instead of decoding tolerantly)."""
    pal = bytes(bytearray(v for i in range(2) for v in (i * 9, i * 9, i * 9, 0)))
    stream = bytes([3, 1, 4, 1, 0, 0, 0, 1])  # 3+4 px into a 2-px row
    img = decode_bmp(_bmp_rle(2, 1, 8, 2, pal, stream))
    assert [p[0] for p in img[0]] == [9, 9]


def test_avi_frame_step_matches_full_decode_slice():
    """frame_step=k decodes exactly the frames the full decode yields
    at indices 0, k, 2k, ... — bit-identical — for both AVI codecs
    (r16 optimization round: sampling callers skip unsampled frames'
    decode work, so the sampled subset must stay exact)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        decode_avi_frames,
        encode_avi,
    )

    frames = _frames(12, 8, 10, seed=77)
    for codec, kwargs in [("dib", {}), ("mjpg", {"quality": 85})]:
        payload = encode_avi(frames, fps=10, codec=codec, **kwargs)
        full, fps_full = decode_avi_frames(payload)
        for step in (1, 2, 3, 4, 5, 12, 99):
            sampled, fps = decode_avi_frames(payload, frame_step=step)
            assert fps == fps_full
            assert np.array_equal(sampled, full[::step]), (codec, step)
    import pytest

    with pytest.raises(ValueError):
        decode_avi_frames(encode_avi(frames, fps=10), frame_step=0)


def test_avi_frame_step_validates_skipped_frames_cheaply():
    """r17 quarantine-contract repair (r16 verdict item 8): a corrupt
    frame at a NEVER-SAMPLED index must still quarantine the clip for
    the cheap structural failure classes — DIB truncation (a len()
    check) and MJPEG missing-SOI (a 2-byte check) — so acceptance no
    longer depends on which index the corruption lands on. Entropy
    corruption behind a valid SOI on a skipped frame remains the
    documented sampling tradeoff."""
    import struct

    import pytest

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
        decode_avi_frames,
        encode_avi,
    )

    def corrupt_nth_frame(payload: bytes, n: int, mode: str) -> bytes:
        # walk top-level + LIST chunks, find the n-th ##db/##dc chunk
        # and the offsets of every enclosing size field (RIFF + LISTs)
        idx = [0]

        def walk(start, end, parents):
            i = start
            while i + 8 <= end:
                cid = payload[i : i + 4]
                (size,) = struct.unpack_from("<I", payload, i + 4)
                if cid == b"LIST":
                    r = walk(i + 12, i + 8 + size, parents + [i + 4])
                    if r is not None:
                        return r
                elif cid[2:4] in (b"db", b"dc"):
                    if idx[0] == n:
                        return i, size, parents
                    idx[0] += 1
                i += 8 + size + (size & 1)
            return None

        found = walk(12, len(payload), [4])
        assert found is not None, "frame chunk not found"
        at, size, parents = found
        out = bytearray(payload)
        if mode == "truncate":
            # shrink the frame chunk to a 4-byte body, consistently
            # fixing every enclosing size field so the container walk
            # stays structurally valid — only the FRAME is too short
            keep = 4
            removed = (size + (size & 1)) - keep
            struct.pack_into("<I", out, at + 4, keep)
            del out[at + 8 + keep : at + 8 + size + (size & 1)]
            for off in parents:
                (psz,) = struct.unpack_from("<I", bytes(out), off)
                struct.pack_into("<I", out, off, psz - removed)
        else:  # kill the SOI marker bytes
            out[at + 8] = 0
            out[at + 9] = 0
        return bytes(out)

    frames = _frames(12, 8, 10, seed=31)
    for codec, kwargs, mode, msg in [
        ("dib", {}, "truncate", "truncated frame 3"),
        ("mjpg", {"quality": 85}, "soi", "missing SOI"),
    ]:
        payload = encode_avi(frames, fps=10, codec=codec, **kwargs)
        bad = corrupt_nth_frame(payload, 3, mode)
        # frame 3 is never sampled at step 2 (samples 0,2,4,...); the
        # pre-r17 decoder silently accepted this clip
        with pytest.raises(ValueError, match=msg):
            decode_avi_frames(bad, frame_step=2)
        # sampled-index corruption still raises, as always (the full
        # decode classifies a SOI-less frame NotImplementedError; both
        # are MALFORMED_PAYLOAD_ERRORS, so quarantine is identical)
        with pytest.raises((ValueError, NotImplementedError)):
            decode_avi_frames(bad, frame_step=1)
        # a clean clip is unaffected
        decode_avi_frames(payload, frame_step=2)
