"""Pure-stdlib JPEG codec (encoder + decoder) — closes the last
``NotImplementedError`` decode surface in the multimodal pipeline
(round 3; JPEG was previously stubbed as "needs external libraries",
but baseline sequential JPEG is implementable with numpy alone).

Scope (deliberately the minimal REAL subset):

* baseline sequential DCT (SOF0), 8-bit samples;
* progressive DCT (SOF2, round 4): multi-scan decode with spectral
  selection AND successive approximation — DC first/refinement scans,
  AC first scans with EOBn run codes, AC refinement scans with
  correction bits (T.81 Annex G.2); plus a progressive ENCODER
  (spectral selection + one successive-approximation level) so the
  decode path is roundtrip-testable without external fixtures;
* 1 component (grayscale) or 3 components (YCbCr) with 4:4:4, 4:2:2
  and 4:2:0 chroma sampling (round 4) — both encoder and decoder
  handle all three via the interleaved-MCU layout; other sampling
  geometries are rejected rather than silently mis-decoded;
* standard Annex-K quantization + Huffman tables in the encoder
  (libjpeg-style quality scaling); the decoder reads whatever DQT/DHT
  tables the stream carries;
* byte stuffing (0xFF00) and DRI/RSTn restart markers in BOTH
  directions (round 4): the decoder resyncs on RSTn, the encoder
  emits DRI + restart markers when ``restart_interval`` is set.

Like the PNG/WAV codecs this is per-payload Python+numpy work wrapped
by an actor-pool ``map_batches`` stage — the Ray-side contract is
"binary column in, feature column out"; the codec is the per-row
kernel, not a hot vectorized path.

Reference semantics: ITU-T T.81 (public spec).  No code is derived
from libjpeg or the reference repo (which does no image work at all).
"""

from __future__ import annotations

import struct

import numpy as np

# --- 8x8 DCT operators (type-II forward / type-III inverse, orthonormal)
_N = 8
_k = np.arange(_N)
_C = np.sqrt(2.0 / _N) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / (2 * _N))
_C[0, :] = np.sqrt(1.0 / _N)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# zigzag order: index i -> (row, col) of the i-th coefficient
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K base quantization tables (natural / raster order)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per T.81 C.2 canonical code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return codes


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the bit-at-a-time decoder."""
    out: dict[tuple[int, int], int] = {}
    for v, (code, length) in _build_codes(bits, vals).items():
        out[(length, code)] = v
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, size-bit code)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def _extend(code: int, size: int) -> int:
    if size == 0:
        return 0
    if code < (1 << (size - 1)):
        return code - (1 << size) + 1
    return code


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    """Entropy-coded-segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn: caller resets between MCUs
                raise _RestartMarker(nxt)
            else:
                raise EOFError("hit marker inside entropy data")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self._n = 0

    def skip_restart(self) -> None:
        """Consume an RSTn marker at the current (aligned) position."""
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code")


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _encoder_planes_and_sampling(img, subsampling: str):
    """Shared encoder front end: color transform + (optional) 4:2:0
    chroma box-downsample.  Returns (planes, H, V, h, w)."""
    img = np.asarray(img)
    if img.ndim == 2:
        return [img.astype(np.float64)], [1], [1], img.shape[0], img.shape[1]
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (h, w) grayscale or (h, w, 3) RGB uint8")
    h, w = img.shape[:2]
    ycc = _rgb_to_ycbcr(img.astype(np.float64))
    planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    if subsampling == "444":
        return planes, [1, 1, 1], [1, 1, 1], h, w
    if subsampling == "420":
        fy, fx = 2, 2
    elif subsampling == "422":
        fy, fx = 1, 2
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    # fy x fx box mean over the factor-padded plane
    he, we = (h + fy - 1) // fy * fy, (w + fx - 1) // fx * fx
    for ci in (1, 2):
        p = np.pad(
            planes[ci], ((0, he - h), (0, we - w)), mode="edge"
        )
        planes[ci] = p.reshape(he // fy, fy, we // fx, fx).mean(axis=(1, 3))
    return planes, [fx, 1, 1], [fy, 1, 1], h, w


def _quantized_grids(planes, qtabs, hs, vs, h, w):
    """Per-component quantized zigzag coefficient grids on the
    MCU-padded geometry: list of (grid_h, grid_w, 64) int64."""
    hmax, vmax = max(hs), max(vs)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    grids = []
    for ci, plane in enumerate(planes):
        gh, gw = mcuy * vs[ci], mcux * hs[ci]
        ph, pw = plane.shape
        pad = np.pad(
            plane, ((0, gh * 8 - ph), (0, gw * 8 - pw)), mode="edge"
        ) - 128.0
        blocks = pad.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)
        coefs = np.einsum("ij,byjk,lk->byil", _C, blocks, _C)
        q = qtabs[min(ci, len(qtabs) - 1)].reshape(8, 8)
        qc = np.round(coefs / q).astype(np.int64).reshape(gh, gw, 64)
        grids.append(qc[..., _ZIGZAG])
    return grids, mcux, mcuy


def _encode_headers(out, qtabs, h, w, ncomp, hs, vs, sof_marker: bytes):
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    for tid, q in enumerate(qtabs):
        zz = q[_ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">HB", 3 + 64, tid) + bytes(
            int(v) for v in zz
        )
    out += sof_marker + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += struct.pack(
            "BBB", ci + 1, (hs[ci] << 4) | vs[ci], 0 if ci == 0 else 1
        )
    hts = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS), (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if ncomp == 3:
        hts += [
            (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in hts:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    return out


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF bytes for a (h, w) grayscale or (h, w, 3) RGB
    uint8 image; ``subsampling`` is ``"444"`` (default), ``"420"``
    (2x2 box-downsampled chroma, MCU-interleaved — the common web
    JPEG layout, round 4) or ``"422"``.  ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that many MCUs
    (resetting DC prediction) — the layout camera JPEGs use."""
    planes, hs, vs, h, w = _encoder_planes_and_sampling(img, subsampling)
    ncomp = len(planes)
    qtabs = [_quality_scale(_Q_LUMA, quality)]
    if ncomp == 3:
        qtabs.append(_quality_scale(_Q_CHROMA, quality))

    out = bytearray(b"\xff\xd8")  # SOI
    out = _encode_headers(out, qtabs, h, w, ncomp, hs, vs, b"\xff\xc0")
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3f\x00"

    dc_codes = [_build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_codes = [_build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if ncomp == 3:
        dc_codes.append(_build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
        ac_codes.append(_build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

    zgrids, mcux, mcuy = _quantized_grids(planes, qtabs, hs, vs, h, w)
    bw = _BitWriter()
    prev_dc = [0] * ncomp
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                # byte-align (1-fill), emit RSTn (cycles 0..7), reset
                # DC prediction — the marker bytes bypass stuffing
                bw.flush()
                bw.buf += bytes(
                    [0xFF, 0xD0 + (mcu_n // restart_interval - 1) % 8]
                )
                prev_dc = [0] * ncomp
            mcu_n += 1
            for ci in range(ncomp):
                ti = min(ci, 1)
                for v in range(vs[ci]):
                    for u in range(hs[ci]):
                        zz = zgrids[ci][my * vs[ci] + v, mx * hs[ci] + u]
                        # DC
                        diff = int(zz[0]) - prev_dc[ci]
                        prev_dc[ci] = int(zz[0])
                        size, code = _magnitude(diff)
                        hc, hl = dc_codes[ti][size]
                        bw.write(hc, hl)
                        if size:
                            bw.write(code, size)
                        # AC with run-lengths
                        run = 0
                        last_nz = np.flatnonzero(zz[1:])
                        last = int(last_nz[-1]) + 1 if len(last_nz) else 0
                        for i in range(1, last + 1):
                            av = int(zz[i])
                            if av == 0:
                                run += 1
                                continue
                            while run > 15:
                                hc, hl = ac_codes[ti][0xF0]  # ZRL
                                bw.write(hc, hl)
                                run -= 16
                            size, code = _magnitude(av)
                            hc, hl = ac_codes[ti][(run << 4) | size]
                            bw.write(hc, hl)
                            bw.write(code, size)
                            run = 0
                        if last < 63:
                            hc, hl = ac_codes[ti][0x00]  # EOB
                            bw.write(hc, hl)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, successive: bool = True,
    subsampling: str = "444",
) -> bytes:
    """Progressive JFIF bytes (SOF2) for the same inputs as
    :func:`encode_jpeg` — identical quantized coefficients, delivered
    over a multi-scan script so :func:`decode_jpeg`'s progressive path
    is roundtrip-testable without external fixtures:

    * DC first scan (all components, MCU-interleaved, Al=1 when
      ``successive``), then a DC refinement scan (Ah=1, Al=0);
    * per component: AC first scans over split spectral bands
      ([1..5], [6..63]) at Al=1 on the component's own
      (non-interleaved) block grid, then an AC refinement scan over
      the full band (Ah=1, Al=0) — with ``successive=False`` the
      single Al=0 first scans per band are emitted instead.

    ``subsampling`` as in :func:`encode_jpeg` ("444"/"422"/"420").
    Decoding this stream MUST equal decoding the baseline stream of
    the same image/quality/subsampling bit-for-bit (asserted in
    tests): both deliver the same quantized coefficients."""
    planes, hs, vs, h, w = _encoder_planes_and_sampling(img, subsampling)
    ncomp = len(planes)
    qtabs = [_quality_scale(_Q_LUMA, quality)]
    if ncomp == 3:
        qtabs.append(_quality_scale(_Q_CHROMA, quality))
    zcoefs, mcux, mcuy = _quantized_grids(planes, qtabs, hs, vs, h, w)
    # non-interleaved (AC-scan) grid per component
    hmax, vmax = max(hs), max(vs)
    bw_c = [((w * hs[i] + hmax - 1) // hmax + 7) // 8 for i in range(ncomp)]
    bh_c = [((h * vs[i] + vmax - 1) // vmax + 7) // 8 for i in range(ncomp)]
    al1 = 1 if successive else 0

    out = bytearray(b"\xff\xd8")
    out = _encode_headers(out, qtabs, h, w, ncomp, hs, vs, b"\xff\xc2")

    dc_codes = [_build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_codes = [_build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if ncomp == 3:
        dc_codes.append(_build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
        ac_codes.append(_build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

    def sos_header(comp_tables, ss, se, ah, al):
        ns = len(comp_tables)
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for cid, tbl in comp_tables:
            hdr += struct.pack("BB", cid, tbl)
        return hdr + struct.pack("BBB", ss, se, (ah << 4) | al)

    def dc_blocks():
        """MCU-interleaved (comp, by, bx) order when ncomp > 1, raster
        otherwise — mirrors the decoder's _scan_units exactly."""
        if ncomp > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in range(ncomp):
                        for v in range(vs[ci]):
                            for u in range(hs[ci]):
                                yield ci, my * vs[ci] + v, mx * hs[ci] + u
        else:
            for my in range(bh_c[0]):
                for mx in range(bw_c[0]):
                    yield 0, my, mx

    # --- DC first scan (all components, point transform Al) ---
    out += sos_header(
        [(ci + 1, (min(ci, 1) << 4)) for ci in range(ncomp)], 0, 0, 0, al1
    )
    bw = _BitWriter()
    prev = [0] * ncomp
    for ci, my, mx in dc_blocks():
        v = int(zcoefs[ci][my, mx, 0]) >> al1
        diff = v - prev[ci]
        prev[ci] = v
        size, code = _magnitude(diff)
        hc, hl = dc_codes[min(ci, 1)][size]
        bw.write(hc, hl)
        if size:
            bw.write(code, size)
    bw.flush()
    out += bw.buf

    # --- AC scans (component grid, not the MCU-padded grid) ---
    bands = [(1, 5), (6, 63)]
    for ci in range(ncomp):
        zc = zcoefs[ci][: bh_c[ci], : bw_c[ci]]
        for ss, se in bands:
            out += sos_header([(ci + 1, min(ci, 1))], ss, se, 0, al1)
            out += _encode_ac_first(zc, ac_codes[min(ci, 1)], ss, se, al1)
    if successive:
        # DC refinement: one raw bit per block per component
        out += sos_header(
            [(ci + 1, 0) for ci in range(ncomp)], 0, 0, 1, 0
        )
        bw = _BitWriter()
        for ci, my, mx in dc_blocks():
            bw.write(int(zcoefs[ci][my, mx, 0]) & 1, 1)
        bw.flush()
        out += bw.buf
        # AC refinement per component over the full band
        for ci in range(ncomp):
            zc = zcoefs[ci][: bh_c[ci], : bw_c[ci]]
            out += sos_header([(ci + 1, min(ci, 1))], 1, 63, 1, 0)
            out += _encode_ac_refine(zc, ac_codes[min(ci, 1)], 1, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)


def _encode_ac_first(zc: np.ndarray, codes, ss: int, se: int, al: int) -> bytes:
    """Entropy bytes of a progressive AC first scan (Ah=0) over band
    [ss, se] with point transform ``al`` — EOB emitted per block
    (eobrun=1; batching EOB runs is an optional optimization)."""
    by, bx, _ = zc.shape
    bw = _BitWriter()
    for my in range(by):
        for mx in range(bx):
            zz = zc[my, mx]
            run = 0
            last = ss - 1
            for k in range(ss, se + 1):
                if abs(int(zz[k])) >> al:
                    last = k
            for k in range(ss, se + 1):
                if k > last:
                    break
                v = int(zz[k])
                a = abs(v) >> al
                if a == 0:
                    run += 1
                    continue
                while run > 15:
                    hc, hl = codes[0xF0]  # ZRL
                    bw.write(hc, hl)
                    run -= 16
                sv = a if v > 0 else -a
                size, code = _magnitude(sv)
                hc, hl = codes[(run << 4) | size]
                bw.write(hc, hl)
                bw.write(code, size)
                run = 0
            if last < se:
                hc, hl = codes[0x00]  # EOB (eobrun = 1)
                bw.write(hc, hl)
    bw.flush()
    return bytes(bw.buf)


def _encode_ac_refine(zc: np.ndarray, codes, ss: int, se: int, al: int) -> bytes:
    """Entropy bytes of a progressive AC refinement scan (Ah=Al+1):
    newly-nonzero coefficients as (run, 1)+sign symbols whose runs
    count ZERO-HISTORY positions only, with each history coefficient's
    correction bit emitted exactly where the decoder's walk for the
    covering symbol reads it (the encoder mirrors
    :func:`_scan_ac_refine`'s control flow position-for-position); EOB
    per block with trailing correction bits for the rest of the band."""
    by, bx, _ = zc.shape
    bw = _BitWriter()
    for my in range(by):
        for mx in range(bx):
            zz = zc[my, mx]
            a = np.abs(zz[ss : se + 1].astype(np.int64)) >> al
            hist = a > 1  # nonzero before this scan
            new = a == 1  # becomes nonzero in this scan
            corr = a & 1
            new_pos = np.flatnonzero(new)
            k = 0  # offset within the band
            n_band = se - ss + 1
            for np_i in new_pos.tolist():
                # zero-history run length between k and the new coef
                r = int(np.count_nonzero(~hist[k:np_i] & ~new[k:np_i]))
                while r > 15:
                    # ZRL: decoder walks from k consuming 16
                    # zero-history positions, reading a correction bit
                    # at every history position it passes
                    hc, hl = codes[0xF0]
                    bw.write(hc, hl)
                    zeros = 0
                    while zeros < 16:
                        if hist[k]:
                            bw.write(int(corr[k]), 1)
                        else:
                            zeros += 1
                        k += 1
                    r -= 16
                hc, hl = codes[(r << 4) | 1]
                bw.write(hc, hl)
                bw.write(1 if int(zz[ss + np_i]) > 0 else 0, 1)
                # decoder walk: history bits between k and the placement
                while k < np_i:
                    if hist[k]:
                        bw.write(int(corr[k]), 1)
                    k += 1
                k = np_i + 1
            if k < n_band:
                # EOB (run of 1): decoder reads correction bits for the
                # remaining history coefficients in the band
                hc, hl = codes[0x00]
                bw.write(hc, hl)
                for p in range(k, n_band):
                    if hist[p]:
                        bw.write(int(corr[p]), 1)
    bw.flush()
    return bytes(bw.buf)


def _scan_units(scan_comps, geom):
    """Yield one restart unit at a time as a list of (comp_idx, by, bx)
    block coordinates: an MCU (per-component Hi×Vi blocks, T.81 A.2.3
    order) when the scan is interleaved, a single block of the
    component's own grid otherwise."""
    if len(scan_comps) > 1:
        for my in range(geom["mcuy"]):
            for mx in range(geom["mcux"]):
                unit = []
                for idx, _, _ in scan_comps:
                    hi, vi = geom["H"][idx], geom["V"][idx]
                    for v in range(vi):
                        for u in range(hi):
                            unit.append((idx, my * vi + v, mx * hi + u))
                yield unit
    else:
        idx = scan_comps[0][0]
        for by in range(geom["bh"][idx]):
            for bx in range(geom["bw"][idx]):
                yield [(idx, by, bx)]


def _scan_baseline(reader, scan_comps, coefs_z, huff, geom, restart_interval):
    """Baseline sequential scan: full DC+AC per block, MCU-interleaved
    (or single-component raster when ns == 1)."""
    prev_dc = {idx: 0 for idx, _, _ in scan_comps}
    tables = {idx: (dct, act) for idx, dct, act in scan_comps}
    for ui, unit in enumerate(_scan_units(scan_comps, geom)):
        if restart_interval and ui and ui % restart_interval == 0:
            reader.byte_align()
            reader.skip_restart()
            for k in prev_dc:
                prev_dc[k] = 0
        for idx, my, mx in unit:
            dct, act = tables[idx]
            try:
                zz = coefs_z[idx][my, mx]
                size = _decode_huff(reader, huff[(0, dct)])
                diff = _extend(reader.read_bits(size), size) if size else 0
                prev_dc[idx] += diff
                zz[0] = prev_dc[idx]
                i = 1
                while i < 64:
                    rs = _decode_huff(reader, huff[(1, act)])
                    run, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if run == 15:
                            i += 16  # ZRL
                            continue
                        break  # EOB
                    i += run
                    if i > 63:
                        raise ValueError("AC run overflow")
                    zz[i] = _extend(reader.read_bits(size), size)
                    i += 1
            except _RestartMarker:
                raise ValueError("unexpected restart marker") from None


def _scan_dc_first(reader, scan_comps, coefs_z, huff, geom, al,
                   restart_interval):
    """Progressive DC first scan (Ah=0): diffs of the point-transformed
    DC values, stored shifted left by Al (T.81 G.1.2.1)."""
    prev_dc = {idx: 0 for idx, _, _ in scan_comps}
    tables = {idx: dct for idx, dct, _ in scan_comps}
    for ui, unit in enumerate(_scan_units(scan_comps, geom)):
        if restart_interval and ui and ui % restart_interval == 0:
            reader.byte_align()
            reader.skip_restart()
            for k in prev_dc:
                prev_dc[k] = 0
        for idx, my, mx in unit:
            size = _decode_huff(reader, huff[(0, tables[idx])])
            diff = _extend(reader.read_bits(size), size) if size else 0
            prev_dc[idx] += diff
            coefs_z[idx][my, mx, 0] = prev_dc[idx] << al


def _scan_dc_refine(reader, scan_comps, coefs_z, geom, al,
                    restart_interval):
    """Progressive DC refinement (Ah>0): one raw bit per block, ORed in
    at position Al — two's-complement OR reconstructs negatives exactly
    because the first scan stored an arithmetic-shifted value."""
    p1 = np.int64(1 << al)
    for ui, unit in enumerate(_scan_units(scan_comps, geom)):
        if restart_interval and ui and ui % restart_interval == 0:
            reader.byte_align()
            reader.skip_restart()
        for idx, my, mx in unit:
            if reader.read_bit():
                coefs_z[idx][my, mx, 0] |= p1


def _scan_ac_first(reader, idx, act, coefs_z, huff, by, bx, ss, se, al,
                   restart_interval):
    """Progressive AC first scan (Ah=0) over one component's band
    [Ss, Se]: run/size coding with EOBn end-of-band run codes."""
    eobrun = 0
    blk = 0
    for my in range(by):
        for mx in range(bx):
            if restart_interval and blk and blk % restart_interval == 0:
                reader.byte_align()
                reader.skip_restart()
                eobrun = 0
            blk += 1
            if eobrun > 0:
                eobrun -= 1
                continue
            zz = coefs_z[idx][my, mx]
            k = ss
            while k <= se:
                rs = _decode_huff(reader, huff[(1, act)])
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run overflow in progressive band")
                zz[k] = _extend(reader.read_bits(s), s) << al
                k += 1


def _scan_ac_refine(reader, idx, act, coefs_z, huff, by, bx, ss, se, al,
                    restart_interval):
    """Progressive AC refinement (Ah>0): correction bits for
    already-nonzero coefficients, ±1<<Al for newly-nonzero ones, EOB
    runs with trailing correction bits (T.81 G.2 / the standard
    decode_mcu_AC_refine control flow)."""
    p1 = 1 << al
    m1 = -(1 << al)
    eobrun = 0
    blk = 0
    for my in range(by):
        for mx in range(bx):
            if restart_interval and blk and blk % restart_interval == 0:
                reader.byte_align()
                reader.skip_restart()
                eobrun = 0
            blk += 1
            zz = coefs_z[idx][my, mx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_huff(reader, huff[(1, act)])
                    r, s = rs >> 4, rs & 0x0F
                    val = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        # r == 15: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError("bad size in AC refinement")
                        val = p1 if reader.read_bit() else m1
                    while k <= se:
                        coef = int(zz[k])
                        if coef != 0:
                            if reader.read_bit():
                                if (coef & p1) == 0:
                                    zz[k] = coef + (p1 if coef >= 0 else m1)
                        else:
                            if r == 0:
                                if val:
                                    zz[k] = val
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eobrun > 0:
                while k <= se:
                    coef = int(zz[k])
                    if coef != 0:
                        if reader.read_bit():
                            if (coef & p1) == 0:
                                zz[k] = coef + (p1 if coef >= 0 else m1)
                    k += 1
                eobrun -= 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode JFIF bytes to (h, w) grayscale or (h, w, 3) RGB uint8.
    Baseline sequential (SOF0/1) AND progressive (SOF2, round 4 —
    spectral selection + successive approximation, DC/AC first and
    refinement scans, EOBn runs).  Handles subsampled chroma (4:2:0 /
    4:2:2 / any integer-ratio sampling — round 4; upsampling by sample
    replication), single-component streams, stream-carried DQT/DHT,
    DRI/RSTn."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtab)
    h = w = 0
    geom: dict = {}
    progressive = False
    restart_interval = 0
    coefs_z: list[np.ndarray] = []  # per comp: (grid_h, grid_w, 64) zigzag
    saw_scan = False
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                nat = np.empty(64, dtype=np.int64)
                nat[_ZIGZAG] = vals
                qtabs[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nvals])
                huff[(tc, th)] = _build_decode_map(bits, vals)
                p += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp, tq))
            hs = [s >> 4 for _, s, _ in comps]
            vs = [s & 0x0F for _, s, _ in comps]
            hmax, vmax = max(hs), max(vs)
            if any(x < 1 or hmax % x for x in hs) or any(
                x < 1 or vmax % x for x in vs
            ):
                raise NotImplementedError(
                    f"non-integer chroma upsampling factors {list(zip(hs, vs))}"
                )
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            geom = {
                "H": hs,
                "V": vs,
                "mcux": mcux,
                "mcuy": mcuy,
                # per-component true dims and non-interleaved block grid
                "cw": [(w * hs[i] + hmax - 1) // hmax for i in range(ncomp)],
                "ch": [(h * vs[i] + vmax - 1) // vmax for i in range(ncomp)],
            }
            geom["bw"] = [(cw + 7) // 8 for cw in geom["cw"]]
            geom["bh"] = [(ch + 7) // 8 for ch in geom["ch"]]
            # coefficient stores use the MCU-padded grid (covers the
            # non-interleaved grid: ceil(cw/8) <= mcux*Hi)
            coefs_z = [
                np.zeros((mcuy * vs[i], mcux * hs[i], 64), dtype=np.int64)
                for i in range(ncomp)
            ]
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cs, tables = seg[1 + 2 * si], seg[2 + 2 * si]
                idx = next(i for i, (cid, _, _) in enumerate(comps) if cid == cs)
                scan_comps.append((idx, tables >> 4, tables & 0x0F))
            ss_, se_, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos += seglen
            reader = _BitReader(data, pos)
            saw_scan = True
            if not progressive:
                _scan_baseline(
                    reader, scan_comps, coefs_z, huff, geom, restart_interval
                )
            elif ss_ == 0:  # DC scan (Se must be 0)
                if ah == 0:
                    _scan_dc_first(
                        reader, scan_comps, coefs_z, huff, geom, al,
                        restart_interval,
                    )
                else:
                    _scan_dc_refine(
                        reader, scan_comps, coefs_z, geom, al,
                        restart_interval,
                    )
            else:  # AC scan: exactly one component
                if ns != 1:
                    raise ValueError("interleaved progressive AC scan")
                idx, _, act = scan_comps[0]
                if ah == 0:
                    _scan_ac_first(
                        reader, idx, act, coefs_z, huff,
                        geom["bh"][idx], geom["bw"][idx], ss_, se_,
                        al, restart_interval,
                    )
                else:
                    _scan_ac_refine(
                        reader, idx, act, coefs_z, huff,
                        geom["bh"][idx], geom["bw"][idx], ss_, se_,
                        al, restart_interval,
                    )
            pos = reader.pos  # just before the next marker
            continue
        pos += seglen
    if not saw_scan or not h:
        raise ValueError("no scan found")

    ncomp = len(comps)
    hmax, vmax = max(geom["H"]), max(geom["V"])
    planes = []
    for ci in range(ncomp):
        gh, gw = coefs_z[ci].shape[:2]
        nat = np.zeros((gh, gw, 64), dtype=np.float64)
        nat[:, :, _ZIGZAG] = coefs_z[ci]
        q = qtabs[comps[ci][2]].reshape(64)
        blocks = (nat * q).reshape(gh, gw, 8, 8)
        spat = np.einsum("ji,byjk,kl->byil", _C, blocks, _C) + 128.0
        img = spat.transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
        img = img[: geom["ch"][ci], : geom["cw"][ci]]
        fy, fx = vmax // geom["V"][ci], hmax // geom["H"][ci]
        if fy > 1 or fx > 1:  # chroma upsample by sample replication
            img = np.repeat(np.repeat(img, fy, axis=0), fx, axis=1)
        planes.append(img[:h, :w])
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    rgb = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
