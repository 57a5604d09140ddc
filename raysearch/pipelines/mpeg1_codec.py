"""Pure-numpy MPEG-1 video (ISO/IEC 11172-2) INTRA-frame codec.

Second real video-codec path next to motion-JPEG (SURVEY §2.11): the
encoder emits a spec-shaped elementary stream — sequence header, GOP,
I-picture, one slice per macroblock row, intra macroblocks with DC
size/differential VLCs and run/level AC VLCs (escape coding for values
outside the table) — and the decoder parses any intra-coded stream
built from those elements: start-code scan, optional in-stream intra
quantizer matrix, slice/macroblock layer, full dct_coefficient VLC
table incl. escapes, MPEG-1 intra dequantization with oddification
(mismatch control) and the orthonormal 8×8 IDCT shared with the JPEG
codec.

Scope (deliberately the minimal REAL subset, like jpeg_codec):

* I-pictures only.  A P/B picture header raises
  ``NotImplementedError`` — inter-coded streams fall under the
  skip-and-count contract (SURVEY §2.11), exactly like H.264.
* 4:2:0 chroma (the only MPEG-1 sampling), frame sizes padded to
  16×16 macroblocks internally and cropped to the header size on
  decode.
* The encoder writes the default intra quantizer matrix or a custom
  one (carried in-stream via load_intra_quantizer_matrix, exercised in
  tests); the decoder honors whichever the stream carries.

The run/level and DC-size VLC tables are transcribed from the public
spec (11172-2 Annex B; the dct_coefficient table is shared with
H.262's table B.14).  Encoder and decoder share ONE table definition,
so roundtrips are self-consistent by construction, and the tests
assert the tables are prefix-free.

Reference analog: none (brief requirement — multimodal decode at
scale); the Ray-side contract is the actor-pool stage in
multimodal.py, this module is the per-payload kernel it calls.
"""

from __future__ import annotations

import struct

import numpy as np

from raysearch.pipelines.jpeg_codec import (
    _ZIGZAG,
    _dct2,
    _idct2,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
)

# --- default intra quantizer matrix (11172-2 §2.4.2.3), raster order
DEFAULT_INTRA_Q = np.array(
    [
        8, 16, 19, 22, 26, 27, 29, 34,
        16, 16, 22, 24, 27, 29, 34, 37,
        19, 22, 26, 27, 29, 34, 34, 38,
        22, 22, 26, 27, 29, 34, 37, 40,
        22, 26, 27, 29, 32, 35, 40, 48,
        26, 27, 29, 32, 35, 40, 48, 58,
        26, 27, 29, 34, 38, 46, 56, 69,
        27, 29, 35, 38, 46, 56, 69, 83,
    ],
    dtype=np.int64,
)

# --- VLC tables (code-string → value); sign bit appended separately ---

#: dct_dc_size_luminance (table B.5a)
_DC_SIZE_LUMA = {
    "100": 0, "00": 1, "01": 2, "101": 3, "110": 4,
    "1110": 5, "11110": 6, "111110": 7, "1111110": 8,
}
#: dct_dc_size_chrominance (table B.5b)
_DC_SIZE_CHROMA = {
    "00": 0, "01": 1, "10": 2, "110": 3, "1110": 4,
    "11110": 5, "111110": 6, "1111110": 7, "11111110": 8,
}

#: macroblock_address_increment (table B.1); escape adds 33
_MB_INC = {
    "1": 1, "011": 2, "010": 3, "0011": 4, "0010": 5,
    "00011": 6, "00010": 7, "0000111": 8, "0000110": 9,
    "00001011": 10, "00001010": 11, "00001001": 12, "00001000": 13,
    "00000111": 14, "00000110": 15,
    "0000010111": 16, "0000010110": 17, "0000010101": 18,
    "0000010100": 19, "0000010011": 20, "0000010010": 21,
    "00000100011": 22, "00000100010": 23, "00000100001": 24,
    "00000100000": 25, "00000011111": 26, "00000011110": 27,
    "00000011101": 28, "00000011100": 29, "00000011011": 30,
    "00000011010": 31, "00000011001": 32, "00000011000": 33,
}
_MB_INC_ESCAPE = "00000001000"
_MB_STUFFING = "00000001111"

#: dct_coefficient run/level table (11172-2 B.5c–f / H.262 B.14),
#: EXCLUDING the sign bit (appended as one extra bit, 0=+, 1=−).
#: "10" is end_of_block; "000001" is the escape prefix.
_AC_CODES: dict[str, tuple[int, int]] = {
    "11": (0, 1), "011": (1, 1), "0100": (0, 2), "0101": (2, 1),
    "00101": (0, 3), "00111": (3, 1), "00110": (4, 1),
    "000110": (1, 2), "000111": (5, 1), "000101": (6, 1),
    "000100": (7, 1),
    "0000110": (0, 4), "0000100": (2, 2), "0000111": (8, 1),
    "0000101": (9, 1),
    "00100110": (0, 5), "00100001": (0, 6), "00100101": (1, 3),
    "00100100": (3, 2), "00100111": (10, 1), "00100011": (11, 1),
    "00100010": (12, 1), "00100000": (13, 1),
    "0000001010": (0, 7), "0000001100": (1, 4), "0000001011": (2, 3),
    "0000001111": (4, 2), "0000001001": (5, 2), "0000001110": (14, 1),
    "0000001101": (15, 1), "0000001000": (16, 1),
    "000000011101": (0, 8), "000000011000": (0, 9),
    "000000010011": (0, 10), "000000010000": (0, 11),
    "000000011011": (1, 5), "000000010100": (2, 4),
    "000000011100": (3, 3), "000000010010": (4, 3),
    "000000011110": (6, 2), "000000010101": (7, 2),
    "000000010001": (8, 2), "000000011111": (17, 1),
    "000000011010": (18, 1), "000000011001": (19, 1),
    "000000010111": (20, 1), "000000010110": (21, 1),
    "0000000011010": (0, 12), "0000000011001": (0, 13),
    "0000000011000": (0, 14), "0000000010111": (0, 15),
    "0000000010110": (1, 6), "0000000010101": (1, 7),
    "0000000010100": (2, 5), "0000000010011": (3, 4),
    "0000000010010": (5, 3), "0000000010001": (9, 2),
    "0000000010000": (10, 2), "0000000011111": (22, 1),
    "0000000011110": (23, 1), "0000000011101": (24, 1),
    "0000000011100": (25, 1), "0000000011011": (26, 1),
    "00000000011111": (0, 16), "00000000011110": (0, 17),
    "00000000011101": (0, 18), "00000000011100": (0, 19),
    "00000000011011": (0, 20), "00000000011010": (0, 21),
    "00000000011001": (0, 22), "00000000011000": (0, 23),
    "00000000010111": (0, 24), "00000000010110": (0, 25),
    "00000000010101": (0, 26), "00000000010100": (0, 27),
    "00000000010011": (0, 28), "00000000010010": (0, 29),
    "00000000010001": (0, 30), "00000000010000": (0, 31),
    "000000000011000": (0, 32), "000000000010111": (0, 33),
    "000000000010110": (0, 34), "000000000010101": (0, 35),
    "000000000010100": (0, 36), "000000000010011": (0, 37),
    "000000000010010": (0, 38), "000000000010001": (0, 39),
    "000000000010000": (0, 40),
    "000000000011111": (1, 8), "000000000011110": (1, 9),
    "000000000011101": (1, 10), "000000000011100": (1, 11),
    "000000000011011": (1, 12), "000000000011010": (1, 13),
    "000000000011001": (1, 14),
    "0000000000010011": (1, 15), "0000000000010010": (1, 16),
    "0000000000010001": (1, 17), "0000000000010000": (1, 18),
    "0000000000010100": (6, 3), "0000000000011010": (11, 2),
    "0000000000011001": (12, 2), "0000000000011000": (13, 2),
    "0000000000010111": (14, 2), "0000000000010110": (15, 2),
    "0000000000010101": (16, 2), "0000000000011111": (27, 1),
    "0000000000011110": (28, 1), "0000000000011101": (29, 1),
    "0000000000011100": (30, 1), "0000000000011011": (31, 1),
}
_AC_EOB = "10"
_AC_ESCAPE = "000001"

#: (run, level) → code string, for the encoder
_AC_ENCODE = {rl: code for code, rl in _AC_CODES.items()}


def _build_vlc_decoder(table: dict[str, object]) -> dict[tuple[int, int], object]:
    """code-string table → {(length, bits): value} lookup."""
    return {(len(c), int(c, 2)): v for c, v in table.items()}


_DC_LUMA_DEC = _build_vlc_decoder(_DC_SIZE_LUMA)
_DC_CHROMA_DEC = _build_vlc_decoder(_DC_SIZE_CHROMA)
_MB_INC_DEC = _build_vlc_decoder(_MB_INC)
_AC_DEC = _build_vlc_decoder(_AC_CODES)
_AC_MAXLEN = max(len(c) for c in _AC_CODES)


# --- plain MSB-first bit I/O (no JPEG byte stuffing) ---


class _Writer:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def code(self, s: str) -> None:
        self.bits(int(s, 2), len(s))

    def align(self) -> None:
        if self.nbits:
            self.bits(0, 8 - self.nbits)

    def start_code(self, code: int) -> None:
        self.align()
        self.out += bytes((0, 0, 1, code))


class _Reader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0  # bit offset within byte

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("mpeg1: truncated stream")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1

    def at_start_code(self) -> bool:
        """The spec's slice-termination test: the next 23 bits are all
        zero (no VLC in the syntax contains 23 consecutive zeros, so
        this can only be zero padding followed by a start code) — or
        the stream ends."""
        pos, bit = self.pos, self.bit
        try:
            v = self.read_bits(23)
        except ValueError:
            self.pos, self.bit = pos, bit
            return True
        self.pos, self.bit = pos, bit
        return v == 0

    def next_start_code(self) -> int | None:
        """Scan forward to the next 00 00 01 xx; return xx (reader is
        positioned after it), or None at end of stream."""
        self.align()
        d = self.data
        p = self.pos
        while p + 4 <= len(d):
            if d[p] == 0 and d[p + 1] == 0 and d[p + 2] == 1:
                self.pos = p + 4
                return d[p + 3]
            p += 1
        self.pos = len(d)
        return None


def _read_vlc(r: _Reader, dec: dict, maxlen: int):
    length = 0
    bits = 0
    while length < maxlen:
        bits = (bits << 1) | r.read_bit()
        length += 1
        v = dec.get((length, bits))
        if v is not None:
            return v
    raise ValueError("mpeg1: invalid VLC code")


# --- start codes ---
_SEQ = 0xB3
_GOP = 0xB8
_PIC = 0x00
_EXT = 0xB5
_USER = 0xB2
_SEQ_END = 0xB7


def _planes_420(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """RGB/gray image → (Y, Cb, Cr) planes padded to 16×16 macroblocks,
    chroma subsampled 2×2 by averaging."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w = img.shape[:2]
    if img.shape[2] == 1:
        y = img[:, :, 0].astype(np.float64)
        cb = np.full(((h + 1) // 2, (w + 1) // 2), 128.0)
        cr = cb.copy()
        ph = (h + 15) // 16 * 16
        pw = (w + 15) // 16 * 16
        y = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = np.pad(
            cb,
            ((0, ph // 2 - cb.shape[0]), (0, pw // 2 - cb.shape[1])),
            mode="edge",
        )
        cr = cb.copy()
        return y, cb, cr, h, w
    ycc = _rgb_to_ycbcr(img.astype(np.float64))
    ph = (h + 15) // 16 * 16
    pw = (w + 15) // 16 * 16
    ycc = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    y = ycc[:, :, 0]
    cb = ycc[:, :, 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr = ycc[:, :, 2].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    return y, cb, cr, h, w


def _quantize_block(block: np.ndarray, qmat: np.ndarray, qs: int) -> np.ndarray:
    """8×8 spatial → zigzag-ordered quantized coefficients (intra)."""
    f = _dct2(block)
    fz = f.reshape(64)[_ZIGZAG]
    qz = qmat.reshape(64)[_ZIGZAG].astype(np.float64)
    out = np.zeros(64, dtype=np.int64)
    out[0] = int(np.round(fz[0] / 8.0))
    ac = np.round(16.0 * fz[1:] / (2.0 * qz[1:] * qs)).astype(np.int64)
    # encodable range: |level| ≤ 255 (escape 16-bit level bound)
    out[1:] = np.clip(ac, -255, 255)
    return out


def _dequant_block(zz: np.ndarray, qmat: np.ndarray, qs: int) -> np.ndarray:
    """Zigzag quantized coefficients → 8×8 spatial (intra dequant with
    MPEG-1 oddification / mismatch control, §2.4.4.1)."""
    qz = qmat.reshape(64)[_ZIGZAG].astype(np.int64)
    rec = np.zeros(64, dtype=np.int64)
    prod = 2 * zz[1:] * qs * qz[1:]
    # integer "/16" truncating toward zero
    rec[1:] = np.sign(prod) * (np.abs(prod) // 16)
    even = (rec[1:] % 2 == 0) & (rec[1:] != 0)
    rec[1:][even] -= np.sign(rec[1:][even])
    rec[0] = zz[0] * 8
    np.clip(rec, -2048, 2047, out=rec)
    f = np.zeros(64, dtype=np.float64)
    f[_ZIGZAG] = rec
    return _idct2(f.reshape(8, 8))


def _write_dc(w: _Writer, diff: int, luma: bool) -> None:
    mag = abs(diff)
    size = 0 if mag == 0 else int(mag).bit_length()
    table = _DC_SIZE_LUMA if luma else _DC_SIZE_CHROMA
    for code, v in table.items():
        if v == size:
            w.code(code)
            break
    if size:
        w.bits(diff if diff > 0 else diff + (1 << size) - 1, size)


def _read_dc(r: _Reader, luma: bool) -> int:
    size = _read_vlc(r, _DC_LUMA_DEC if luma else _DC_CHROMA_DEC, 8)
    if size == 0:
        return 0
    v = r.read_bits(size)
    if v >> (size - 1):
        return v
    return v - (1 << size) + 1


def _write_ac(w: _Writer, zz: np.ndarray) -> None:
    nz = np.flatnonzero(zz[1:]) + 1
    run = 0
    prev = 0
    for i in nz.tolist():
        run = i - prev - 1
        prev = i
        level = int(zz[i])
        code = _AC_ENCODE.get((run, abs(level)))
        if code is not None:
            w.code(code)
            w.bits(1 if level < 0 else 0, 1)
        else:
            w.code(_AC_ESCAPE)
            w.bits(run, 6)
            if -127 <= level <= 127 and level != 0:
                w.bits(level & 0xFF, 8)
            else:
                # double-byte escape: 8-bit marker then 16-bit level
                if level > 0:
                    w.bits(0x00, 8)
                    w.bits(level, 8)
                else:
                    w.bits(0x80, 8)
                    w.bits(level & 0xFF if level >= -255 else 0, 8)
    w.code(_AC_EOB)


def _read_ac(r: _Reader, zz: np.ndarray) -> None:
    idx = 0
    while True:
        # EOB ("10") and escape ("000001") share the prefix space with
        # the run/level table; peek bit-by-bit against all three
        length = 0
        bits = 0
        while True:
            bits = (bits << 1) | r.read_bit()
            length += 1
            if length == len(_AC_EOB) and bits == int(_AC_EOB, 2):
                return
            if length == len(_AC_ESCAPE) and bits == int(_AC_ESCAPE, 2):
                run = r.read_bits(6)
                lv = r.read_bits(8)
                if lv == 0x00:
                    level = r.read_bits(8)
                elif lv == 0x80:
                    level = r.read_bits(8) - 256
                elif lv > 128:
                    level = lv - 256
                else:
                    level = lv
                break
            rl = _AC_DEC.get((length, bits))
            if rl is not None:
                run, level = rl
                if r.read_bit():
                    level = -level
                break
            if length > _AC_MAXLEN:
                raise ValueError("mpeg1: invalid AC coefficient code")
        idx += run + 1
        if idx > 63:
            raise ValueError("mpeg1: AC coefficient index overflow")
        zz[idx] = level


def encode_mpeg1_iframe(
    img: np.ndarray,
    quantizer_scale: int = 8,
    intra_matrix: np.ndarray | None = None,
    fps_code: int = 3,
) -> bytes:
    """Encode one image as a self-contained MPEG-1 intra-coded video
    stream: sequence header (+ optional custom intra matrix), GOP,
    one I-picture (one slice per macroblock row), sequence_end.

    ``quantizer_scale`` ∈ [1, 31]; ``intra_matrix`` is a raster-order
    8×8 int matrix carried in-stream when given (entry [0] must be 8,
    per spec the DC step is fixed)."""
    if not 1 <= quantizer_scale <= 31:
        raise ValueError("quantizer_scale must be in [1, 31]")
    qmat = DEFAULT_INTRA_Q if intra_matrix is None else np.asarray(
        intra_matrix, dtype=np.int64
    ).reshape(64)
    y, cb, cr, h, w_ = _planes_420(np.asarray(img))
    mbh, mbw = y.shape[0] // 16, y.shape[1] // 16
    if mbh > 0xAF:
        raise ValueError(
            "mpeg1: image taller than 175 macroblock rows (2800 px) — "
            "slice_vertical_position is 8 bits"
        )

    w = _Writer()
    # sequence header
    w.start_code(_SEQ)
    w.bits(w_, 12)
    w.bits(h, 12)
    w.bits(1, 4)  # pel_aspect_ratio: square
    w.bits(fps_code, 4)
    w.bits(0x3FFFF, 18)  # bit_rate: variable
    w.bits(1, 1)  # marker
    w.bits(0, 10)  # vbv_buffer_size
    w.bits(0, 1)  # constrained_parameters_flag
    if intra_matrix is None:
        w.bits(0, 1)
    else:
        w.bits(1, 1)
        zz = qmat[_ZIGZAG]
        for v in zz.tolist():
            w.bits(int(v), 8)
    w.bits(0, 1)  # load_non_intra_quantizer_matrix
    # GOP header
    w.start_code(_GOP)
    w.bits(0, 25)  # time_code
    w.bits(1, 1)  # closed_gop
    w.bits(0, 1)  # broken_link
    # picture header: I-picture
    w.start_code(_PIC)
    w.bits(0, 10)  # temporal_reference
    w.bits(1, 3)  # picture_coding_type = I
    w.bits(0xFFFF, 16)  # vbv_delay
    w.bits(0, 1)  # extra_bit_picture

    for row in range(mbh):
        w.start_code(row + 1)
        w.bits(quantizer_scale, 5)
        w.bits(0, 1)  # extra_bit_slice
        pred = [128, 128, 128]  # DC predictors: Y, Cb, Cr
        for col in range(mbw):
            w.code("1")  # macroblock_address_increment = 1
            w.code("1")  # macroblock_type: intra
            blocks = [
                (y[row * 16 : row * 16 + 8, col * 16 : col * 16 + 8], 0),
                (y[row * 16 : row * 16 + 8, col * 16 + 8 : col * 16 + 16], 0),
                (y[row * 16 + 8 : row * 16 + 16, col * 16 : col * 16 + 8], 0),
                (
                    y[
                        row * 16 + 8 : row * 16 + 16,
                        col * 16 + 8 : col * 16 + 16,
                    ],
                    0,
                ),
                (cb[row * 8 : row * 8 + 8, col * 8 : col * 8 + 8], 1),
                (cr[row * 8 : row * 8 + 8, col * 8 : col * 8 + 8], 2),
            ]
            for block, comp in blocks:
                zz = _quantize_block(block, qmat, quantizer_scale)
                diff = int(np.clip(zz[0], 0, 255)) - pred[comp]
                pred[comp] = pred[comp] + diff
                _write_dc(w, diff, luma=comp == 0)
                _write_ac(w, zz)
    w.start_code(_SEQ_END)
    return bytes(w.out)


def decode_mpeg1_iframe(data: bytes) -> np.ndarray:
    """Decode the FIRST intra-coded picture of an MPEG-1 video
    elementary stream to an (h, w, 3) uint8 RGB array.

    Raises ``NotImplementedError`` for P/B pictures (inter coding —
    SURVEY §2.11 skip-and-count contract), ``ValueError`` for
    malformed streams."""
    r = _Reader(data)
    qmat = DEFAULT_INTRA_Q.copy()
    h = w_ = 0
    seen_seq = False
    while True:
        sc = r.next_start_code()
        if sc is None:
            raise ValueError("mpeg1: no picture in stream")
        if sc == _SEQ:
            w_ = r.read_bits(12)
            h = r.read_bits(12)
            r.read_bits(4)  # pel aspect
            r.read_bits(4)  # picture rate
            r.read_bits(18)  # bit rate
            if not r.read_bit():
                raise ValueError("mpeg1: sequence header marker bit 0")
            r.read_bits(10)  # vbv
            r.read_bit()  # constrained
            if r.read_bit():  # load_intra_quantizer_matrix
                zz = np.array([r.read_bits(8) for _ in range(64)], np.int64)
                qmat = np.zeros(64, np.int64)
                qmat[_ZIGZAG] = zz
            if r.read_bit():  # load_non_intra_quantizer_matrix
                for _ in range(64):
                    r.read_bits(8)
            seen_seq = True
        elif sc in (_GOP, _EXT, _USER):
            continue
        elif sc == _PIC:
            if not seen_seq:
                raise ValueError("mpeg1: picture before sequence header")
            r.read_bits(10)  # temporal reference
            ptype = r.read_bits(3)
            if ptype != 1:
                raise NotImplementedError(
                    f"mpeg1: only intra-coded (I) pictures are supported, "
                    f"got picture_coding_type={ptype}"
                )
            r.read_bits(16)  # vbv_delay
            while r.read_bit():  # extra_information_picture
                r.read_bits(8)
            break
        elif sc == _SEQ_END:
            raise ValueError("mpeg1: no picture in stream")
        # any other start code before the picture: skip

    if h == 0 or w_ == 0:
        raise ValueError("mpeg1: zero frame dimensions")
    mbh, mbw = (h + 15) // 16, (w_ + 15) // 16
    y = np.zeros((mbh * 16, mbw * 16), np.float64)
    cb = np.full((mbh * 8, mbw * 8), 128.0)
    cr = np.full((mbh * 8, mbw * 8), 128.0)

    while True:
        sc = r.next_start_code()
        if sc is None or not 0x01 <= sc <= 0xAF:
            break
        row = sc - 1
        qs = r.read_bits(5)
        if qs == 0:
            raise ValueError("mpeg1: quantizer_scale 0")
        while r.read_bit():  # extra_bit_slice
            r.read_bits(8)
        pred = [128, 128, 128]
        mb_addr = row * mbw - 1
        while True:
            # stuffing / escape / increment
            inc = 0
            while True:
                length = 0
                bits = 0
                v = None
                while length < 11:
                    bits = (bits << 1) | r.read_bit()
                    length += 1
                    if length == 11 and bits == int(_MB_STUFFING, 2):
                        v = "stuff"
                        break
                    if length == 11 and bits == int(_MB_INC_ESCAPE, 2):
                        v = "escape"
                        break
                    got = _MB_INC_DEC.get((length, bits))
                    if got is not None:
                        v = got
                        break
                if v == "stuff":
                    continue
                if v == "escape":
                    inc += 33
                    continue
                if v is None:
                    raise ValueError("mpeg1: invalid macroblock increment")
                inc += v
                break
            if inc > 1:
                pred = [128, 128, 128]  # skipped MBs reset DC prediction
            mb_addr += inc
            row_i, col = divmod(mb_addr, mbw)
            if row_i >= mbh:
                raise ValueError("mpeg1: macroblock address overflow")
            # macroblock_type (I-picture): '1' intra, '01' intra+quant
            if r.read_bit() == 0:
                if r.read_bit() != 1:
                    raise ValueError("mpeg1: bad I-macroblock type")
                qs = r.read_bits(5)
                if qs == 0:
                    raise ValueError("mpeg1: quantizer_scale 0")
            for bi in range(6):
                zz = np.zeros(64, np.int64)
                comp = 0 if bi < 4 else bi - 3
                diff = _read_dc(r, luma=comp == 0)
                pred[comp] += diff
                zz[0] = pred[comp]
                _read_ac(r, zz)
                block = _dequant_block(zz, qmat, qs)
                if bi < 4:
                    by = row_i * 16 + (bi // 2) * 8
                    bx = col * 16 + (bi % 2) * 8
                    y[by : by + 8, bx : bx + 8] = block
                elif bi == 4:
                    cb[
                        row_i * 8 : row_i * 8 + 8, col * 8 : col * 8 + 8
                    ] = block
                else:
                    cr[
                        row_i * 8 : row_i * 8 + 8, col * 8 : col * 8 + 8
                    ] = block
            # slice ends when the next bits (after this MB) hit a
            # byte-aligned start code
            if r.at_start_code() or r.pos >= len(r.data):
                break

    up_cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
    up_cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
    ycc = np.stack([y, up_cb, up_cr], axis=2)
    rgb = np.clip(np.round(_ycbcr_to_rgb(ycc)), 0, 255).astype(np.uint8)
    return rgb[:h, :w_]
