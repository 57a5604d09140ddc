"""Pure-stdlib media codecs (PNG + WAV) for the multimodal pipeline.

This container has no image/audio libraries, but the PNG format
(zlib-compressed filtered scanlines, RFC 2083) and RIFF/WAVE PCM are
fully decodable with ``zlib`` / ``wave`` + numpy — so the decode stage
can be REAL for those formats and honestly ``NotImplementedError`` only
for codecs that genuinely need external libraries (JPEG, MP4/H.264).

Supported:

* PNG — 8-bit greyscale (color type 0), RGB (2), grey+alpha (4),
  RGBA (6), non-interlaced; all five scanline filters (None / Sub /
  Up / Average / Paeth).  The encoder writes filter-0 rows by default
  but can apply any fixed filter (used by tests to exercise every
  decoder unfilter path).
* WAV — 8/16-bit integer PCM via the stdlib ``wave`` module.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (RFC 2083 §6.6)."""
    ai, bi, ci = a.astype(np.int16), b.astype(np.int16), c.astype(np.int16)
    p = ai + bi - ci
    pa, pb, pc = np.abs(p - ai), np.abs(p - bi), np.abs(p - ci)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (h, w) or (h, w, ch∈{1,2,3,4}) → PNG bytes.

    ``filter_type`` applies that fixed filter to every scanline (0-4;
    non-zero values exist so tests can cover each decoder path)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    img = np.ascontiguousarray(img, dtype=np.uint8)
    prev = np.zeros((w, ch), dtype=np.uint8)
    lines = []
    for y in range(h):
        cur = img[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:  # Sub
            left = np.vstack((np.zeros((1, ch), np.uint8), cur[:-1]))
            filt = (cur.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # Up
            filt = (cur.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:  # Average
            left = np.vstack((np.zeros((1, ch), np.uint8), cur[:-1]))
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            filt = (cur.astype(np.int16) - avg).astype(np.uint8)
        elif filter_type == 4:  # Paeth
            left = np.vstack((np.zeros((1, ch), np.uint8), cur[:-1]))
            ul = np.vstack((np.zeros((1, ch), np.uint8), prev[:-1]))
            filt = (cur.astype(np.int16) - _paeth(left, prev, ul)).astype(np.uint8)
        else:
            raise ValueError(f"bad filter {filter_type}")
        lines.append(bytes([filter_type]) + filt.tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w, ch).  Non-interlaced; 8-bit in
    all color types, 16-bit (downscaled to 8 via the MSB) for
    gray/RGB/alpha types, and 8-bit palette images (PLTE lookup, tRNS
    alpha when present — round 4)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, [], None
    plte = trns = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    palette = color_type == 3
    if (
        interlace != 0
        or color_type not in (0, 2, 3, 4, 6)
        or depth not in (8, 16)
        or (palette and depth != 8)
    ):
        raise NotImplementedError(
            f"unsupported PNG (depth={depth} color={color_type} "
            f"interlace={interlace})"
        )
    if palette and plte is None:
        raise ValueError("palette PNG without PLTE")
    # scanline filters operate on BYTES with a left-offset of
    # bytes-per-pixel, so 16-bit rows unfilter as pixels of 2·ch bytes
    ch = 1 if palette else _CHANNELS[color_type]
    wire_ch = ch * (2 if depth == 16 else 1)
    raw = zlib.decompress(b"".join(idat))
    stride = 1 + w * wire_ch
    if len(raw) != stride * h:
        raise ValueError("bad PNG payload length")
    out = np.zeros((h, w, wire_ch), dtype=np.uint8)
    prev = np.zeros((w, wire_ch), dtype=np.uint8)
    ch = wire_ch  # unfilter loop below works in wire bytes-per-pixel
    for y in range(h):
        row = np.frombuffer(raw, np.uint8, count=stride, offset=y * stride)
        ft, line = int(row[0]), row[1:].reshape(w, ch).copy()
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub: prefix sum over pixels (per channel, mod 256)
            cur = np.cumsum(line.astype(np.uint64), axis=0).astype(np.uint8)
        elif ft == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ft == 3:  # Average: left-dependence is sequential per pixel
            cur = np.empty_like(line)
            left = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                left = (
                    line[x].astype(np.int16)
                    + (left + prev[x].astype(np.int16)) // 2
                ) % 256
                cur[x] = left.astype(np.uint8)
        elif ft == 4:  # Paeth (sequential per pixel)
            cur = np.empty_like(line)
            for x in range(w):
                a = cur[x - 1] if x else np.zeros(ch, np.uint8)
                c = prev[x - 1] if x else np.zeros(ch, np.uint8)
                cur[x] = (
                    line[x].astype(np.int16) + _paeth(a, prev[x], c)
                ).astype(np.uint8)
        else:
            raise ValueError(f"bad scanline filter {ft}")
        out[y] = cur
        prev = cur
    if depth == 16:
        # big-endian 16-bit samples → 8-bit via the high byte
        out = out.reshape(h, w, wire_ch // 2, 2)[..., 0]
    if palette:
        rgb = plte[out[:, :, 0]]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.concatenate(
                (rgb, alpha[out[:, :, 0]][:, :, None]), axis=2
            )
        return rgb
    return out


def encode_wav(
    samples: np.ndarray, rate: int = 8000, sampwidth: int = 2
) -> bytes:
    """int16 (or uint8 when sampwidth=1) sample array (n,) or (n, ch)
    → RIFF/WAVE bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(sampwidth)
        f.setframerate(rate)
        f.writeframes(np.ascontiguousarray(samples).tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 samples in [-1, 1] shaped (n, ch), rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        ch, sw, rate, n = (
            f.getnchannels(),
            f.getsampwidth(),
            f.getframerate(),
            f.getnframes(),
        )
        raw = f.readframes(n)
    if sw == 2:
        arr = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"unsupported sample width {sw}")
    return arr.reshape(-1, ch), rate


# ---------------------------------------------------------------------------
# feature extraction (deterministic, FEAT_DIM floats)
# ---------------------------------------------------------------------------


def image_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """[tag, w, h, ch, mean, std, 10-bin luminance histogram] scaled to
    [0, 1]-ish floats; deterministic."""
    h, w, ch = img.shape
    lum = img.astype(np.float64).mean(axis=2)
    hist, _ = np.histogram(lum, bins=dim - 6, range=(0.0, 255.0))
    hist = hist / max(1, lum.size)
    return np.concatenate(
        (
            [1.0, w / 4096.0, h / 4096.0, ch / 4.0,
             float(lum.mean()) / 255.0, float(lum.std()) / 255.0],
            hist,
        )
    )


def audio_features(samples: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """[tag, duration_s, rate, ch, rms, zero-crossing rate, 10-window
    RMS envelope]; deterministic."""
    n, ch = samples.shape
    mono = samples.mean(axis=1)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if n > 1 else 0.0
    nwin = dim - 6
    env = np.zeros(nwin)
    if n:
        bounds = np.linspace(0, n, nwin + 1).astype(int)
        for i in range(nwin):
            seg = mono[bounds[i] : bounds[i + 1]]
            env[i] = np.sqrt(np.mean(seg**2)) if len(seg) else 0.0
    return np.concatenate(
        ([2.0, n / rate / 60.0, rate / 48000.0, ch / 4.0, rms, zcr], env)
    )
