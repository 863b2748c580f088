"""Pure-Python baseline JPEG codec (the last image format from the
multimodal scope that is closable without external libraries).

JPEG's entropy layer is Huffman coding — implementable exactly with a
Python bit reader — and its transform layer is the 8×8 DCT, which is
two numpy matrix multiplies per block. That makes baseline
(sequential, 8-bit, Huffman) JFIF decodable and encodable with the
same struct+numpy discipline as :mod:`operators.codecs` (r6 task #3,
PNG in r9). Scope, honestly drawn:

* DECODE: baseline DCT (SOF0) and progressive DCT (SOF2, r10 — the
  majority variant of real-world web JPEGs), 8-bit precision, 1 or 3
  components, 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers
  (DRI/RSTn), multi-segment DQT/DHT. Progressive covers the full
  Annex-G Huffman envelope: interleaved/non-interleaved DC first +
  refinement scans, per-component AC first + refinement scans with
  spectral selection, successive approximation and EOB runs. Out of
  scope — extended-sequential (SOF1) with >8-bit, arithmetic coding
  (SOF9+), hierarchical — raise ``NotImplementedError``; corrupt
  streams raise ``ValueError`` (the malformed-payload contract).
* ENCODE: baseline, 4:4:4 (grayscale or RGB), Annex-K standard
  quantization tables scaled by a ``quality`` parameter and the
  Annex-K standard Huffman tables — the exact tables every libjpeg
  encoder defaults to. Deterministic bytes for a given input. Plus a
  progressive encoder (:func:`encode_jpeg_progressive`) emitting a
  4-phase scan script (DC first @Al=1 → per-component AC first @Al=1
  → DC refine → per-component AC refine) that transmits EXACTLY the
  baseline-quantized coefficients, so progressive and baseline
  encodes of the same image decode to IDENTICAL pixels (pinned in
  tests — the strongest cross-check the two code paths allow).

Lossy means the round trip is approximate: quantization error is
bounded by the chosen tables, pinned in tests as PSNR floors plus an
exact DC-only case. The per-payload Python here (bit reader, Huffman
walk) runs inside the Arrow ``mapInPandas`` stages of
:mod:`operators.multimodal` where per-payload Python is the contract;
the per-block math (DCT, dequantize, clip, color transform) is numpy.

Reference tie: SURVEY §2.12 multimodal scope; closes the JPEG line of
the r5-r8 "What's missing" compressed-codec item for baseline files.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import (
    OversizedPayloadError,
    _normalizes_malformed,
)

#: JPEG decodes through full-resolution float64 MCU planes
#: (8 B/px/component) plus progressive int32 coefficient buffers —
#: ~28 B/px for a 3-component image, an order of magnitude above the
#: 3 B/px RGB-output assumption behind the generic
#: ``codecs.MAX_DECODE_PIXELS`` rationale (r15, ADVICE r14: a
#: cap-passing 16384x16384 SOF would still demand several GB of
#: intermediates). Cap JPEG dimensions so the decoder's
#: *intermediates* stay inside a ~1 GiB envelope by default:
#: 2^30 / 28 ≈ 38 M px (a ~6100x6100 photo passes; the crafted
#: 16384x16384 bomb fails fast, before any allocation).
#:
#: This is a RESOURCE limit, not a malformedness judgment (r15
#: ADVICE): an over-cap payload raises
#: :class:`~...operators.codecs.OversizedPayloadError` (a
#: ``ValueError`` subclass, so quarantine semantics are unchanged),
#: and deployments with more executor headroom raise the cap via the
#: ``SPARK_GRAFT_MAX_JPEG_PIXELS`` env var — an env var rather than
#: a module global because decode runs inside Arrow workers, where
#: only the environment (``spark.executorEnv.*`` on a cluster; the
#: inherited process env on local mode) reliably propagates.
_JPEG_INTERMEDIATE_BYTES_PER_PX = 28
MAX_JPEG_DECODE_PIXELS = int(
    os.environ.get(
        "SPARK_GRAFT_MAX_JPEG_PIXELS",
        (1 << 30) // _JPEG_INTERMEDIATE_BYTES_PER_PX,
    )
)

# --------------------------------------------------------------- tables

#: Annex K.1 — luminance quantization, natural (row-major) order.
_STD_LUMA_Q = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

#: Annex K.2 — chrominance quantization.
_STD_CHROMA_Q = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

#: Annex K.3 standard Huffman tables: (bits[1..16], huffval).
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: Zigzag scan order: _ZIGZAG[k] = (row, col) of the k-th coefficient.
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Orthonormal 8-point DCT-II basis; IDCT is A.T @ X @ A, forward is
#: A @ x @ A.T — float64 throughout, one rounding at the end.
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _A[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, per the JPEG canonical-code algorithm."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), inverse of :func:`_huff_decode_table`."""
    return {v: (c, l) for (l, c), v in _huff_decode_table(bits, vals).items()}


class _HuffTable:
    """Canonical Huffman DECODE table in min/max-code form (T.81
    Annex F, figure F.16) — r16 optimization round. The decoder used
    to probe a dict keyed by ``(length, code)`` once per candidate
    length; tuple hashing made that the hottest line of every JPEG
    decode. Canonical codes of each length are CONSECUTIVE integers
    ``[mincode[l], maxcode[l]]``, so containment is two int compares
    and the symbol is ``vals[delta[l] + code]`` — the accept/reject
    set is exactly the dict's key set, including for malformed DHTs
    (both are built by the identical canonical fill; the mincode
    bound matters there — an overflowing BITS array can make
    ``code <= maxcode[l]`` true for codes the dict never contained).
    A DHT whose BITS counts overrun its VALS list raises the same
    ``IndexError`` the dict build hit on ``vals[i]`` (normalized to
    the malformed-payload ``ValueError`` by the decode wrapper)."""

    __slots__ = ("mincode", "maxcode", "delta", "vals")

    def __init__(self, bits: list[int], vals: list[int]):
        mincode = [0] * 17
        maxcode = [-1] * 17
        delta = [0] * 17
        code = 0
        i = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                mincode[length] = code
                delta[length] = i - code
                code += n
                maxcode[length] = code - 1
                i += n
            code <<= 1
        if i > len(vals):
            raise IndexError("DHT VALS shorter than its BITS counts")
        self.mincode = mincode
        self.maxcode = maxcode
        self.delta = delta
        self.vals = list(vals[:i])


#: Annex-K standard decode tables, built ONCE at import (r16
#: optimization round: the default_huffman path — every DHT-less MJPEG
#: frame — was rebuilding all four tables per decode). Shared
#: read-only by every decode; per-payload DHT segments still build
#: their own.
_STD_DC_TABLES = {
    0: _HuffTable(*_STD_DC_LUMA),
    1: _HuffTable(*_STD_DC_CHROMA),
}
_STD_AC_TABLES = {
    0: _HuffTable(*_STD_AC_LUMA),
    1: _HuffTable(*_STD_AC_CHROMA),
}


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing
    and RSTn awareness (scan segments are split on restarts before
    reading, so the reader itself never sees markers).

    r16 optimization round: bit-by-bit byte indexing (~1 µs/bit of
    pure interpreter work, the measured hot path of every JPEG/MJPEG
    decode) is replaced by windowed extraction — one
    ``int.from_bytes`` over at most 5 bytes yields up to 40 bits, so
    a whole Huffman code or magnitude field is one slice + shift +
    mask. Bit semantics are unchanged and pinned by the pixel-exact
    fixtures: reads are MSB-first from ``bitpos``, exhaustion raises
    the moment a needed bit lies beyond the last byte (trailing
    padding bits inside the final byte remain readable), and
    exhaustion-vs-invalid-code priority inside ``read_huff`` matches
    the old per-bit order."""

    __slots__ = ("data", "nbits", "bitpos")

    def __init__(self, data: bytes):
        self.data = data
        self.nbits = len(data) * 8
        self.bitpos = 0

    def read_bit(self) -> int:
        bp = self.bitpos
        if bp >= self.nbits:
            raise ValueError("JPEG entropy stream exhausted mid-symbol")
        self.bitpos = bp + 1
        return (self.data[bp >> 3] >> (7 - (bp & 7))) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        bp = self.bitpos
        end = bp + n
        if end > self.nbits:
            raise ValueError("JPEG entropy stream exhausted mid-symbol")
        byte = bp >> 3
        off = bp & 7
        # ceil((off + n) / 8) bytes cover the field; n <= 16 in every
        # caller (Huffman magnitude categories), so 5 bytes always do.
        window = int.from_bytes(self.data[byte : byte + ((off + n + 7) >> 3)],
                                "big")
        self.bitpos = end
        return (window >> (((off + n + 7) & ~7) - off - n)) & ((1 << n) - 1)

    def read_huff(self, table: "_HuffTable") -> int:
        bp = self.bitpos
        byte = bp >> 3
        off = bp & 7
        chunk = self.data[byte : byte + 5]
        window = int.from_bytes(chunk, "big")
        shift = len(chunk) * 8 - off  # == bits available in the window
        mincode = table.mincode
        maxcode = table.maxcode
        for length in range(1, 17):
            if length > shift:
                # needing a bit beyond the stream end — the same
                # condition (and message) the per-bit reader raised
                raise ValueError("JPEG entropy stream exhausted mid-symbol")
            code = (window >> (shift - length)) & ((1 << length) - 1)
            if mincode[length] <= code <= maxcode[length]:
                self.bitpos = bp + length
                return table.vals[table.delta[length] + code]
        raise ValueError("invalid JPEG Huffman code")

    def read_code_mag(self, table: "_HuffTable") -> tuple[int, int]:
        """BASELINE-AC fast path: one window peek yields the Huffman
        RS symbol AND its ``s = rs & 0xF``-bit raw magnitude field —
        the pair every baseline AC coefficient consumes back-to-back
        (T.81 F.2.2.2), saving a second slice + ``from_bytes`` per
        coefficient in the decode's hottest loop. Consumes exactly
        ``codelen + (rs & 0xF)`` bits: for EOB/ZRL (s == 0) that is
        the code alone, identical to the two-step read. NOT valid for
        DC (magnitude width is the full symbol, which a malformed DHT
        can push past 15) or progressive AC (s == 0 consumes r EOBRUN
        bits instead) — both keep the two-step reads. Worst case
        7 + 16 + 15 = 38 bits fit the 9-byte window."""
        bp = self.bitpos
        byte = bp >> 3
        off = bp & 7
        chunk = self.data[byte : byte + 9]
        window = int.from_bytes(chunk, "big")
        shift = len(chunk) * 8 - off
        mincode = table.mincode
        maxcode = table.maxcode
        for length in range(1, 17):
            if length > shift:
                raise ValueError("JPEG entropy stream exhausted mid-symbol")
            code = (window >> (shift - length)) & ((1 << length) - 1)
            if mincode[length] <= code <= maxcode[length]:
                sym = table.vals[table.delta[length] + code]
                end = length + (sym & 0xF)
                if end > shift:
                    raise ValueError(
                        "JPEG entropy stream exhausted mid-symbol"
                    )
                self.bitpos = bp + end
                return sym, (window >> (shift - end)) & ((1 << (sym & 0xF)) - 1)
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _unstuff(data: bytes) -> bytes:
    """Drop the 0x00 stuffing byte after literal 0xFF in entropy data."""
    return data.replace(b"\xff\x00", b"\xff")


# --------------------------------------------------------------- decode


@_normalizes_malformed("JPEG")
def decode_jpeg(payload: bytes, default_huffman: bool = False) -> np.ndarray:
    """Decode a JFIF payload (baseline or progressive) — the public
    entry point (malformed-payload contract via the shared
    :func:`~...codecs._normalizes_malformed`: r14 fuzzing measured
    truncation/bit-flip mutations leaking raw
    ``IndexError``/``OverflowError`` out of the Huffman and
    coefficient paths). Format envelope in
    :func:`_decode_jpeg_impl`."""
    return _decode_jpeg_impl(payload, default_huffman)


def _decode_jpeg_impl(payload: bytes, default_huffman: bool = False) -> np.ndarray:
    """Decode a baseline JFIF payload into uint8 (h, w) grayscale or
    (h, w, 3) RGB (BT.601 full-range, the JFIF convention). See the
    module docstring for the supported/rejected envelope.

    ``default_huffman=True`` resolves Huffman-table ids with no DHT
    segment to the Annex-K standard tables — the OpenDML MJPEG
    convention (AVI MJPEG frames routinely omit DHT and the spec
    directs decoders to assume the standard tables). Off by default:
    a standalone JFIF with a missing DHT is malformed and stays a
    ``ValueError``."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # B.1.1.2: any number of 0xFF fill bytes
            pos += 1        # may pad before a marker — skip one and
            continue        # re-test (the next byte may be the code)
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                tbl = np.frombuffer(seg, np.uint8, 64, o + 1).astype(np.int64)
                q = np.zeros(64, np.int64)
                q[_ZIGZAG] = tbl  # stored in zigzag order
                qt[tq] = q.reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                n = sum(bits)
                vals = list(seg[o + 17 : o + 17 + n])
                tab = _HuffTable(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                o += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            if h <= 0 or w <= 0:
                raise ValueError(f"bad JPEG dimensions {w}x{h}")
            if h * w > MAX_JPEG_DECODE_PIXELS:
                raise OversizedPayloadError(
                    f"JPEG dimensions {w}x{h} exceed the decode pixel "
                    f"cap ({MAX_JPEG_DECODE_PIXELS} px; raise via "
                    f"SPARK_GRAFT_MAX_JPEG_PIXELS)"
                )
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}: "
                "extended/lossless/arithmetic)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if frame.get("progressive"):
                if default_huffman:
                    for tid, tab in _STD_DC_TABLES.items():
                        dc_tabs.setdefault(tid, tab)
                    for tid, tab in _STD_AC_TABLES.items():
                        ac_tabs.setdefault(tid, tab)
                return _decode_progressive(
                    payload, pos - 2, frame, qt, dc_tabs, ac_tabs,
                    restart_interval,
                )
            ns = seg[0]
            if ns != len(frame["comps"]):
                # baseline allows several single-component scans; the
                # MCU walk below assumes ONE interleaved scan — reject
                # cleanly rather than KeyError mid-decode
                raise NotImplementedError(
                    "multi-scan (non-interleaved) baseline JPEG"
                )
            scan_tabs = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tabs[cs] = (tt >> 4, tt & 0xF)
            for c in frame["comps"]:
                if c["id"] not in scan_tabs:
                    raise ValueError("JPEG SOS component ids != SOF ids")
            data_start = pos + seglen
            if default_huffman:
                for tid, tab in _STD_DC_TABLES.items():
                    dc_tabs.setdefault(tid, tab)
                for tid, tab in _STD_AC_TABLES.items():
                    ac_tabs.setdefault(tid, tab)
            return _decode_scan(
                payload, data_start, frame, scan_tabs, qt, dc_tabs, ac_tabs,
                restart_interval,
            )
        pos += seglen
    raise ValueError("JPEG stream ended without SOS")


def _decode_scan(payload, start, frame, scan_tabs, qt, dc_tabs, ac_tabs, dri):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if h == 0 or w == 0:
        raise ValueError("bad JPEG dimensions")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise NotImplementedError("JPEG sampling factors beyond 2x2")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # split entropy data on RSTn markers (decoder resync points)
    end = payload.find(b"\xff\xd9", start)
    if end < 0:
        end = len(payload)
    segments = _split_restarts(payload[start:end])

    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), np.float64)
        for c in comps
    ]
    # r17: entropy-decode ALL blocks first (zigzag rows + positions per
    # component), then dequantize + IDCT each component as ONE stacked
    # matmul — removes ~6 small NumPy dispatches per 8×8 block from the
    # hot loop. ``_A.T @ B @ _A`` over a (N,8,8) stack calls the same
    # dgemm per 2-D slice as the old per-block expression, and the
    # whole decode is pinned bit-equal to the per-block path (unit test
    # over adversarial coefficient blocks + the corpus-wide equality
    # run in OPTIMIZATION_r17.md; einsum, which DOES reassociate the
    # sums, remains rejected — see _decode_progressive's history).
    # Memory: 64 int64 per pending block ≈ the plane itself; bounded
    # by the same MAX_JPEG_DECODE_PIXELS cap as the output.
    pend_zz: list[list[list[int]]] = [[] for _ in comps]
    pend_pos: list[list[tuple[int, int]]] = [[] for _ in comps]
    pred = [0] * len(comps)
    reader = _BitReader(segments[0])
    seg_idx = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("JPEG missing restart segment")
                reader = _BitReader(segments[seg_idx])
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct_tab = dc_tabs.get(scan_tabs[c["id"]][0])
                act_tab = ac_tabs.get(scan_tabs[c["id"]][1])
                if dct_tab is None or act_tab is None:
                    raise ValueError("JPEG scan references missing DHT")
                q = qt.get(c["tq"])
                if q is None:
                    raise ValueError("JPEG component references missing DQT")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        # zigzag coefficients in a plain list: scalar
                        # stores into an int64 ndarray cost ~3× a list
                        # slot, and the array round-trip below is one
                        # C call either way (r16 optimization round —
                        # same integers, same order)
                        zz = [0] * 64
                        t = reader.read_huff(dct_tab)
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            # fused code+magnitude read (one window
                            # peek per AC coefficient); bit-for-bit
                            # the old read_huff + read_bits sequence
                            rs, mag = reader.read_code_mag(act_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overrun")
                            # inline _extend (F.2.2.1 sign extension)
                            zz[k] = (
                                mag
                                if mag >= (1 << (s - 1))
                                else mag - (1 << s) + 1
                            )
                            k += 1
                        pend_zz[ci].append(zz)
                        pend_pos[ci].append(
                            ((my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8)
                        )
            mcu_count += 1

    for ci, c in enumerate(comps):
        rows = pend_zz[ci]
        if not rows:
            continue
        coeff = np.zeros((len(rows), 64), np.int64)
        coeff[:, _ZIGZAG] = np.asarray(rows, dtype=np.int64)
        # identical op order to the old per-block path: dequantize in
        # int64, promote in the matmul, +128.0 last
        px = _A.T @ (coeff.reshape(-1, 8, 8) * qt[c["tq"]]) @ _A + 128.0
        plane = planes[ci]
        for (y0, x0), blk in zip(pend_pos[ci], px):
            plane[y0 : y0 + 8, x0 : x0 + 8] = blk

    return _merge_planes(comps, planes, h, w, hmax, vmax)


def _split_restarts(raw: bytes) -> list[bytes]:
    """Split entropy-coded data on RSTn markers, unstuffing each
    segment (shared by the baseline and progressive scan decoders)."""
    segments = []
    seg_start = 0
    i = 0
    while i < len(raw) - 1:
        if raw[i] == 0xFF and 0xD0 <= raw[i + 1] <= 0xD7:
            segments.append(_unstuff(raw[seg_start:i]))
            seg_start = i + 2
            i += 2
        else:
            i += 1
    segments.append(_unstuff(raw[seg_start:]))
    return segments


def _merge_planes(comps, planes, h, w, hmax, vmax) -> np.ndarray:
    """Upsample subsampled planes to full resolution, crop, merge to
    grayscale or RGB (BT.601 full-range)."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# -------------------------------------------------- progressive decode


def _next_marker(payload: bytes, start: int) -> int:
    """End of an entropy-coded segment: index of the next 0xFF that
    introduces a real marker (not 0x00 stuffing, not RSTn, not a fill
    byte)."""
    i = start
    n = len(payload)
    while True:
        i = payload.find(b"\xff", i)
        if i < 0 or i + 1 >= n:
            return n
        b = payload[i + 1]
        if b == 0x00 or 0xD0 <= b <= 0xD7:
            i += 2
        elif b == 0xFF:
            i += 1
        else:
            return i


def _decode_progressive(payload, pos, frame, qt, dc_tabs, ac_tabs, dri):
    """Progressive (SOF2) Huffman decode, T.81 Annex G: accumulate
    DCT coefficients across scans (DC first/refine, per-component AC
    first/refine with spectral selection, successive approximation
    and EOB runs), then dequantize + IDCT once at EOI. ``pos`` points
    at the first SOS marker; this loop owns the rest of the stream
    (DHT/DQT/DRI may be redefined between scans)."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if h == 0 or w == 0:
        raise ValueError("bad JPEG dimensions")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise NotImplementedError("JPEG sampling factors beyond 2x2")
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # coefficient store per component (zigzag index order), padded to
    # the interleaved MCU grid; non-interleaved scans touch only the
    # ceil(comp_dim/8) prefix
    coefs = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
        for c in comps
    ]
    nblocks = []
    for c in comps:
        cw = -(-w * c["h"] // hmax)
        ch_ = -(-h * c["v"] // vmax)
        nblocks.append(((ch_ + 7) // 8, (cw + 7) // 8))
    cid_to_ci = {c["id"]: i for i, c in enumerate(comps)}

    saw_scan = False
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                tbl = np.frombuffer(seg, np.uint8, 64, o + 1).astype(np.int64)
                q = np.zeros(64, np.int64)
                q[_ZIGZAG] = tbl
                qt[tq] = q.reshape(8, 8)
                o += 65
        elif marker == 0xC4:
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                n = sum(bits)
                vals = list(seg[o + 17 : o + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffTable(bits, vals)
                o += 17 + n
        elif marker == 0xDD:
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            ns = seg[0]
            sel = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                if cs not in cid_to_ci:
                    raise ValueError("JPEG SOS component ids != SOF ids")
                sel.append((cid_to_ci[cs], tt >> 4, tt & 0xF))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            data_start = pos + seglen
            end = _next_marker(payload, data_start)
            _decode_prog_scan(
                coefs, comps, sel, ss, se, ah, al,
                _split_restarts(payload[data_start:end]),
                dri, dc_tabs, ac_tabs, mcus_x, mcus_y, nblocks,
            )
            saw_scan = True
            pos = end
            continue
        # APPn/COM: skip
        pos += seglen
    if not saw_scan:
        raise ValueError("JPEG stream ended without SOS")

    planes = []
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("JPEG component references missing DQT")
        by, bx = coefs[ci].shape[:2]
        nat = np.zeros((by, bx, 64), np.int64)
        nat[..., _ZIGZAG] = coefs[ci]
        blocks = nat.reshape(by * bx, 8, 8) * q
        # r17: ONE stacked matmul over the block stack. np.matmul runs
        # the same dgemm per 2-D slice in the baseline decoder's exact
        # op order, so progressive==baseline pixel equality holds
        # bit-for-bit (pinned by the fixtures and the corpus equality
        # run); einsum — which DOES reassociate the inner sums and
        # drifted a .5-boundary pixel when tried — stays rejected.
        px = _A.T @ blocks.astype(np.float64) @ _A + 128.0
        planes.append(
            px.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
    return _merge_planes(comps, planes, h, w, hmax, vmax)


def _decode_prog_scan(
    coefs, comps, sel, ss, se, ah, al, segments, dri,
    dc_tabs, ac_tabs, mcus_x, mcus_y, nblocks,
):
    """One progressive scan over the coefficient store. Restart
    markers reset the DC predictors and the EOB run."""
    if ss == 0:
        if se != 0:
            raise ValueError("progressive scan mixes DC and AC")
    else:
        if len(sel) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if not (1 <= ss <= se <= 63):
            raise ValueError("bad spectral selection")
    # the scan's block sequence, grouped into restart units (MCUs for
    # interleaved scans, single blocks for non-interleaved ones)
    units = []
    if len(sel) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                unit = []
                for ci, td, ta in sel:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            unit.append(
                                (ci, td, ta, my * c["v"] + by, mx * c["h"] + bx)
                            )
                units.append(unit)
    else:
        ci, td, ta = sel[0]
        bh, bw = nblocks[ci]
        for r in range(bh):
            for cc in range(bw):
                units.append([(ci, td, ta, r, cc)])

    reader = _BitReader(segments[0])
    seg_idx = 0
    pred = [0] * len(comps)
    eobrun = 0
    for u_idx, unit in enumerate(units):
        if dri and u_idx and u_idx % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG missing restart segment")
            reader = _BitReader(segments[seg_idx])
            pred = [0] * len(comps)
            eobrun = 0
        for ci, td, ta, r, cc in unit:
            block = coefs[ci][r, cc]
            if ss == 0:
                if ah == 0:  # DC first
                    tab = dc_tabs.get(td)
                    if tab is None:
                        raise ValueError("JPEG scan references missing DHT")
                    t = reader.read_huff(tab)
                    pred[ci] += _extend(reader.read_bits(t), t)
                    block[0] = pred[ci] << al
                else:  # DC refinement: one raw bit
                    if reader.read_bit():
                        block[0] |= 1 << al
            else:
                tab = ac_tabs.get(ta)
                if tab is None:
                    raise ValueError("JPEG scan references missing DHT")
                if ah == 0:
                    eobrun = _ac_first_block(reader, block, ss, se, al, tab, eobrun)
                else:
                    eobrun = _ac_refine_block(reader, block, ss, se, al, tab, eobrun)


def _ac_first_block(reader, block, ss, se, al, tab, eobrun):
    """G.1.2.2: first AC scan of a band — run/size coding with EOB
    runs; coefficients land shifted left by the scan's Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_huff(tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("JPEG progressive AC index overrun")
        block[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, block, ss, se, al, tab, eobrun):
    """G.1.2.3: AC refinement — newly-nonzero coefficients arrive as
    ±(1<<Al) after runs of zero-history positions; every nonzero-
    history position passed contributes one correction bit."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_huff(tab)
            r, s = rs >> 4, rs & 0xF
            if s:
                if s != 1:
                    raise ValueError("invalid JPEG AC refinement symbol")
                val = p1 if reader.read_bit() else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break  # remainder handled by the EOB tail below
                val = 0  # ZRL: skip 16 zero-history positions
            while k <= se:
                c = int(block[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        block[k] = c + (p1 if c >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(block[k])
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    block[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


# --------------------------------------------------------------- encode


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg's quality→scale mapping over the Annex-K tables."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    luma = np.clip((_STD_LUMA_Q * scale + 50) // 100, 1, 255)
    chroma = np.clip((_STD_CHROMA_Q * scale + 50) // 100, 1, 255)
    return luma, chroma


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


def _encode_block(wr, block, q, dc_tab, ac_tab, pred):
    coeff = _A @ (block - 128.0) @ _A.T
    zz = np.rint(coeff / q).astype(np.int64).reshape(64)[_ZIGZAG]
    diff = int(zz[0]) - pred
    t = int(diff).bit_length() if diff != 0 else 0
    code, ln = dc_tab[t]
    wr.write(code, ln)
    if t:
        v = diff if diff > 0 else diff + (1 << t) - 1
        wr.write(v, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            wr.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_tab[(run << 4) | s]
        wr.write(code, ln)
        mag = v if v > 0 else v + (1 << s) - 1
        wr.write(mag, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        wr.write(code, ln)
    return int(zz[0])


def _prepare_encode(img: np.ndarray, quality: int, subsampling: str):
    """Shared encode front half: validate, color-transform, subsample
    and MCU-pad. Returns (gray, h, w, hv, qts, padded_planes, mcus_x,
    mcus_y, luma_q, chroma_q)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and not (img.ndim == 3 and img.shape[2] == 3):
        raise ValueError("expected (h,w) grayscale or (h,w,3) RGB uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    sub = subsampling == "420" and not gray
    luma_q, chroma_q = _quality_tables(quality)
    if gray:
        planes = [img.astype(np.float64)]
        qts = [luma_q]
        hv = [(1, 1)]
    else:
        x = img.astype(np.float64)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub:
            # 2×2 box-average chroma over even-padded dims
            eh, ew = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cb = np.pad(cb, ((0, eh - h), (0, ew - w)), mode="edge")
            cr = np.pad(cr, ((0, eh - h), (0, ew - w)), mode="edge")
            cb = cb.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            hv = [(2, 2), (1, 1), (1, 1)]
        else:
            hv = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [luma_q, chroma_q, chroma_q]

    # pad each plane so the MCU grid tiles it exactly
    hmax = max(p[0] for p in hv)
    vmax = max(p[1] for p in hv)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (ch_, cv_) in zip(planes, hv):
        th, tw = mcus_y * cv_ * 8, mcus_x * ch_ * 8
        padded.append(
            np.pad(
                p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
            )
        )
    return gray, h, w, hv, qts, padded, mcus_x, mcus_y, luma_q, chroma_q


def _emit_headers(
    h, w, nc, hv, luma_q, chroma_q, gray, sof_marker, restart_interval
) -> bytearray:
    """SOI through DRI (everything before the first SOS), shared by
    the baseline (SOF0) and progressive (SOF2) encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0

    def dqt(tid: int, q: np.ndarray) -> bytes:
        z = q.reshape(64)[_ZIGZAG]
        return (
            b"\xff\xdb"
            + struct.pack(">H", 67)
            + bytes([tid])
            + bytes(int(v) for v in z)
        )

    out += dqt(0, luma_q)
    if not gray:
        out += dqt(1, chroma_q)

    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += struct.pack(
            ">BBB", i + 1, (hv[i][0] << 4) | hv[i][1], 0 if i == 0 else 1
        )
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", len(sof) + 2) + sof

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    out += dht(0, 0, _STD_DC_LUMA) + dht(1, 0, _STD_AC_LUMA)
    if not gray:
        out += dht(0, 1, _STD_DC_CHROMA) + dht(1, 1, _STD_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    return out


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline
    JFIF with Annex-K standard Huffman tables. ``subsampling`` is
    ``"444"`` (every plane full resolution) or ``"420"`` (chroma 2×2
    box-averaged — the dominant real-world layout, and the path that
    exercises the decoder's multi-block interleave + upsample).
    Deterministic; ``restart_interval`` > 0 emits DRI + RSTn every
    that many MCUs (the resync path the decoder must honor)."""
    gray, h, w, hv, qts, padded, mcus_x, mcus_y, luma_q, chroma_q = (
        _prepare_encode(img, quality, subsampling)
    )
    nc = 1 if gray else 3
    out = _emit_headers(
        h, w, nc, hv, luma_q, chroma_q, gray, 0xC0, restart_interval
    )

    sos = bytes([nc])
    for i in range(nc):
        sos += struct.pack(">BB", i + 1, 0x00 if i == 0 else 0x11)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_enc = [
        _huff_encode_table(*_STD_DC_LUMA),
        _huff_encode_table(*_STD_DC_CHROMA),
    ]
    ac_enc = [
        _huff_encode_table(*_STD_AC_LUMA),
        _huff_encode_table(*_STD_AC_CHROMA),
    ]
    wr = _BitWriter()
    pred = [0] * nc
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                out += wr.flush()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                wr = _BitWriter()
                pred = [0] * nc
            for ci in range(nc):
                ti = 0 if ci == 0 else 1
                ch_, cv_ = hv[ci]
                for by in range(cv_):
                    for bx in range(ch_):
                        y0 = (my * cv_ + by) * 8
                        x0 = (mx * ch_ + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(
                            wr, block, qts[ci], dc_enc[ti], ac_enc[ti], pred[ci]
                        )
            mcu += 1
    out += wr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------- progressive encode


def _quantized_zigzag_blocks(padded: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(by, bx, 64) int64 quantized coefficients in zigzag order —
    the exact values the baseline scan emits. Deliberately the SAME
    per-block ``_A @ (block-128) @ _A.T`` as :func:`_encode_block`
    (NOT a batched einsum: a different float summation order shifts
    coefficients sitting exactly on .5 by one ULP and ``rint`` then
    rounds them differently, breaking progressive==baseline pixel
    equality — observed on a real block)."""
    by, bx = padded.shape[0] // 8, padded.shape[1] // 8
    out = np.empty((by, bx, 64), np.int64)
    for r in range(by):
        for c in range(bx):
            block = padded[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8]
            coeff = _A @ (block - 128.0) @ _A.T
            out[r, c] = np.rint(coeff / q).astype(np.int64).reshape(64)[_ZIGZAG]
    return out


def _emit_ac_first(wr, zig, ss, se, al, ac_tab) -> None:
    """First AC scan of one block at successive-approximation Al:
    encode trunc(|c|/2^Al) with the baseline run/size alphabet. EOB
    runs are deliberately held at length 1 (symbol 0x00 per block) so
    the Annex-K standard AC tables — which lack the longer EOBn
    symbols — always suffice; the decoder handles general runs."""
    r = 0
    emitted = False
    for k in range(ss, se + 1):
        t = int(abs(int(zig[k])) >> al)
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, ln = ac_tab[0xF0]
            wr.write(code, ln)
            r -= 16
        s = t.bit_length()
        code, ln = ac_tab[(r << 4) | s]
        wr.write(code, ln)
        mag = t if int(zig[k]) > 0 else (1 << s) - 1 - t
        wr.write(mag, s)
        r = 0
        emitted = True
    if r > 0 or not emitted:
        code, ln = ac_tab[0x00]  # EOB run of exactly 1
        wr.write(code, ln)


def _emit_ac_refine(wr, zig, ss, se, al, ac_tab) -> None:
    """AC refinement of one block (Ah = Al+1 → one correction bit per
    previously-nonzero coefficient; newly-visible ±1<<Al coefficients
    carry runs of zero-history positions). Mirrors the decoder's
    G.1.2.3 walk; EOB runs held at 1 as in :func:`_emit_ac_first`."""
    absv = [abs(int(zig[k])) >> al for k in range(64)]
    eob = 0
    for k in range(ss, se + 1):
        if absv[k] == 1:
            eob = k
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            code, ln = ac_tab[0xF0]
            wr.write(code, ln)
            r -= 16
            for b in br:
                wr.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        code, ln = ac_tab[(r << 4) | 1]
        wr.write(code, ln)
        wr.write(1 if int(zig[k]) > 0 else 0, 1)
        for b in br:
            wr.write(b, 1)
        br = []
        r = 0
    if r > 0 or br or eob == 0:
        code, ln = ac_tab[0x00]  # EOB run of 1, with trailing bits
        wr.write(code, ln)
        for b in br:
            wr.write(b, 1)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode uint8 grayscale/RGB as PROGRESSIVE JFIF (SOF2) with a
    4-phase scan script exercising every Annex-G Huffman scan kind:

    1. DC first, interleaved, Ah=0/Al=1 (diffs of ``c0 >> 1``);
    2. per-component AC first, Ss=1..63, Ah=0/Al=1;
    3. DC refinement, interleaved, Ah=1/Al=0 (one raw bit/block);
    4. per-component AC refinement, Ah=1/Al=0 (correction bits).

    The script transmits EXACTLY the baseline-quantized coefficients
    — after full refinement the decoder holds the same numbers a
    baseline scan delivers, so ``decode_jpeg(progressive)`` equals
    ``decode_jpeg(baseline)`` pixel-for-pixel at the same quality and
    subsampling (pinned in tests). Standard Annex-K tables; EOB runs
    length-1 by construction (see :func:`_emit_ac_first`).
    Deterministic bytes for a given input."""
    gray, h, w, hv, qts, padded, mcus_x, mcus_y, luma_q, chroma_q = (
        _prepare_encode(img, quality, subsampling)
    )
    nc = 1 if gray else 3
    out = _emit_headers(h, w, nc, hv, luma_q, chroma_q, gray, 0xC2, 0)
    zigs = [
        _quantized_zigzag_blocks(padded[ci], qts[ci]) for ci in range(nc)
    ]
    dc_enc = [
        _huff_encode_table(*_STD_DC_LUMA),
        _huff_encode_table(*_STD_DC_CHROMA),
    ]
    ac_enc = [
        _huff_encode_table(*_STD_AC_LUMA),
        _huff_encode_table(*_STD_AC_CHROMA),
    ]
    hmax = max(p[0] for p in hv)
    vmax = max(p[1] for p in hv)

    def interleaved_blocks():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(nc):
                    ch_, cv_ = hv[ci]
                    for by in range(cv_):
                        for bx in range(ch_):
                            yield ci, my * cv_ + by, mx * ch_ + bx

    def comp_blocks(ci):
        cw = -(-w * hv[ci][0] // hmax)
        ch_ = -(-h * hv[ci][1] // vmax)
        for r in range((ch_ + 7) // 8):
            for c in range((cw + 7) // 8):
                yield r, c

    def sos(comps_spec: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(comps_spec)])
        for cid, td, ta in comps_spec:
            body += struct.pack(">BB", cid, (td << 4) | ta)
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    all_comps = [(i + 1, 0 if i == 0 else 1, 0) for i in range(nc)]

    # scan 1: DC first (Al=1), interleaved
    out += sos(all_comps, 0, 0, 0, 1)
    wr = _BitWriter()
    pred = [0] * nc
    for ci, r, c in interleaved_blocks():
        v = int(zigs[ci][r, c, 0]) >> 1  # arithmetic shift (floor)
        diff = v - pred[ci]
        pred[ci] = v
        t = abs(diff).bit_length()
        code, ln = dc_enc[0 if ci == 0 else 1][t]
        wr.write(code, ln)
        if t:
            wr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    out += wr.flush()

    # scan 2: AC first (Al=1), one scan per component
    for ci in range(nc):
        ti = 0 if ci == 0 else 1
        out += sos([(ci + 1, 0, ti)], 1, 63, 0, 1)
        wr = _BitWriter()
        for r, c in comp_blocks(ci):
            _emit_ac_first(wr, zigs[ci][r, c], 1, 63, 1, ac_enc[ti])
        out += wr.flush()

    # scan 3: DC refinement (Ah=1, Al=0): one raw bit per block
    out += sos(all_comps, 0, 0, 1, 0)
    wr = _BitWriter()
    for ci, r, c in interleaved_blocks():
        wr.write(int(zigs[ci][r, c, 0]) & 1, 1)
    out += wr.flush()

    # scan 4: AC refinement (Ah=1, Al=0), one scan per component
    for ci in range(nc):
        ti = 0 if ci == 0 else 1
        out += sos([(ci + 1, 0, ti)], 1, 63, 1, 0)
        wr = _BitWriter()
        for r, c in comp_blocks(ci):
            _emit_ac_refine(wr, zigs[ci][r, c], 1, 63, 0, ac_enc[ti])
        out += wr.flush()

    out += b"\xff\xd9"  # EOI
    return bytes(out)
