"""Pure-stdlib baseline JPEG codec (encoder + decoder) — closes the
last ``NotImplementedError`` decode surface in the multimodal pipeline
(round 3; JPEG was previously stubbed as "needs external libraries",
but baseline sequential JPEG is implementable with numpy alone).

Scope (deliberately the minimal REAL subset):

* baseline sequential DCT (SOF0), 8-bit samples;
* 1 component (grayscale) or 3 components (YCbCr) with 4:4:4 sampling
  — the encoder never subsamples, the decoder rejects subsampled
  chroma rather than silently mis-decoding;
* standard Annex-K quantization + Huffman tables in the encoder
  (libjpeg-style quality scaling); the decoder reads whatever DQT/DHT
  tables the stream carries;
* byte stuffing (0xFF00) and DRI/RSTn restart markers in the decoder;
  the encoder emits no restarts.

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


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """Baseline JFIF bytes for a (h, w) grayscale or (h, w, 3) RGB
    uint8 image; 4:4:4 (no chroma subsampling)."""
    img = np.asarray(img)
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        ycc = _rgb_to_ycbcr(img.astype(np.float64))
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        raise ValueError("expected (h, w) grayscale or (h, w, 3) RGB uint8")
    h, w = planes[0].shape
    ncomp = len(planes)

    qtabs = [_quality_scale(_Q_LUMA, quality)]
    if ncomp == 3:
        qtabs.append(_quality_scale(_Q_CHROMA, quality))

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    # DQT (natural order -> zigzag order on the wire)
    for tid, q in enumerate(qtabs):
        zz = q[_ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">HB", 3 + 64, tid) + bytes(
            int(v) for v in zz
        )
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    # DHT: DC/AC luma (+ chroma)
    hts = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS), (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if ncomp == 3:
        hts += [
            (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in hts:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
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

    bw = _BitWriter()
    by = (h + 7) // 8
    bx = (w + 7) // 8
    prev_dc = [0] * ncomp
    # quantized coefficients per component, precomputed vectorized:
    # pad to block multiple, blockize, DCT all blocks at once
    qcoefs = []
    for ci, plane in enumerate(planes):
        pad = np.pad(plane, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge") - 128.0
        blocks = pad.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        coefs = np.einsum("ij,byjk,lk->byil", _C, blocks, _C)
        q = qtabs[min(ci, len(qtabs) - 1)].reshape(8, 8)
        qc = np.round(coefs / q).astype(np.int64)
        qcoefs.append(qc)
    for my in range(by):
        for mx in range(bx):
            for ci in range(ncomp):
                ti = min(ci, 1)
                zz = qcoefs[ci][my, mx].reshape(64)[_ZIGZAG]
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
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        hc, hl = ac_codes[ti][0xF0]  # ZRL
                        bw.write(hc, hl)
                        run -= 16
                    size, code = _magnitude(v)
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


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline sequential JFIF bytes to (h, w) grayscale or
    (h, w, 3) RGB uint8.  Supports 4:4:4 or single-component streams,
    stream-carried DQT/DHT, DRI/RSTn; rejects progressive (SOF2) and
    subsampled chroma explicitly."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtab)
    h = w = 0
    restart_interval = 0
    scan_comps: list[tuple[int, int, int]] = []  # (comp idx, dc table, ac table)
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp, tq))
            if any(s != 0x11 for _, s, _ in comps):
                raise NotImplementedError(
                    "subsampled chroma not supported (encoder is 4:4:4)"
                )
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cs, tables = seg[1 + 2 * si], seg[2 + 2 * si]
                idx = next(i for i, (cid, _, _) in enumerate(comps) if cid == cs)
                scan_comps.append((idx, tables >> 4, tables & 0x0F))
            pos += seglen
            break
        pos += seglen
    if not scan_comps or not h:
        raise ValueError("no scan found")

    ncomp = len(comps)
    by = (h + 7) // 8
    bx = (w + 7) // 8
    coefs = [np.zeros((by, bx, 8, 8), dtype=np.float64) for _ in range(ncomp)]
    reader = _BitReader(data, pos)
    prev_dc = [0] * ncomp
    mcu = 0
    for my in range(by):
        for mx in range(bx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.byte_align()
                reader.skip_restart()
                prev_dc = [0] * ncomp
            mcu += 1
            for idx, dct, act in scan_comps:
                try:
                    zz = np.zeros(64, dtype=np.int64)
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
                nat = np.empty(64, dtype=np.int64)
                nat[_ZIGZAG] = zz
                q = qtabs[comps[idx][2]]
                coefs[idx][my, mx] = nat.reshape(8, 8) * q
    planes = []
    for ci in range(ncomp):
        spat = np.einsum("ji,byjk,kl->byil", _C, coefs[ci], _C) + 128.0
        img = spat.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)[:h, :w]
        planes.append(img)
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    rgb = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
