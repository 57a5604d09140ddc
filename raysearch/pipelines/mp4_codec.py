"""Minimal ISO-BMFF (MP4) container codec — pure stdlib struct/bytes.

This makes the video path's CONTAINER layer real: the fixture writes
genuine MP4 boxes (ftyp / moov / trak / mdia / minf / stbl with
stts, stsz, stsc, stco / mdat) and :func:`parse_mp4` is a real box
walker that recovers the sample table — timescale, per-sample
durations, sizes, and absolute file offsets — exactly the demux work a
frame sampler does before handing samples to a codec.  Only the CODEC
layer (H.264 entropy decode) stays honestly unsupported; sample bytes
here are opaque.

Box layout knowledge is the public ISO/IEC 14496-12 structure
(box = u32 size + 4cc type; full box adds u8 version + u24 flags).

The writer emits one chunk (all samples contiguous in one mdat), a
single stts run (uniform sample duration), and per-sample stsz — the
shape real single-track fragmentless files use.  The parser is more
general: multi-run stts and multi-chunk stsc/stco resolve per-sample
offsets correctly.
"""

from __future__ import annotations

import struct

import numpy as np

#: fixed bytes before moov: ftyp(24) — see _FTYP
_FTYP = (
    struct.pack(">I", 24) + b"ftyp" + b"isom" + struct.pack(">I", 0) + b"isom" + b"mp41"
)

#: moov size for n samples is MOOV_BASE + 4*n (stsz grows 4 bytes per
#: sample; everything else is fixed) — asserted in encode_mp4 so layout
#: drift breaks loudly.  mdat payload starts after moov + 8-byte mdat
#: header: MDAT_BASE(n) = len(_FTYP) + MOOV_BASE + 4*n + 8.
MOOV_BASE = 490


def mdat_base(n_samples: int) -> int:
    """Absolute file offset of the first sample for an
    :func:`encode_mp4` file with ``n_samples`` samples (closed form —
    the SQL oracle recomputes byte offsets from this)."""
    return len(_FTYP) + MOOV_BASE + 4 * int(n_samples) + 8


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, payload: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + payload)


def encode_mp4(
    sample_sizes: "np.ndarray | list[int]",
    sample_payloads: list[bytes] | None = None,
    frame_dur: int = 40,
    timescale: int = 1000,
    width: int = 64,
    height: int = 64,
    codec: bytes = b"opqv",
) -> bytes:
    """One-track video MP4 with ``len(sample_sizes)`` samples of
    uniform duration ``frame_dur`` (in ``timescale`` units).  Sample
    bytes default to a deterministic fill; pass ``sample_payloads`` to
    control them (each must match its size).  ``codec`` is the stsd
    sample-entry 4cc: ``b"opqv"`` marks opaque/undecodable samples;
    ``b"jpeg"`` (the ISO/QuickTime motion-JPEG entry) marks samples
    that ARE baseline JPEG images and ``b"mp1v"`` marks samples that
    are self-contained MPEG-1 I-frame streams — the two truly
    decodable video codec paths (raysearch.pipelines.jpeg_codec /
    mpeg1_codec)."""
    if len(codec) != 4:
        raise ValueError("codec must be a 4cc")
    sizes = np.asarray(sample_sizes, dtype=np.int64)
    n = len(sizes)
    duration = n * frame_dur
    if sample_payloads is None:
        sample_payloads = [
            bytes((int(s) * 31 + j) % 256 for j in range(int(s))) for s in sizes
        ]
    if any(len(p) != int(s) for p, s in zip(sample_payloads, sizes)):
        raise ValueError("sample payload length != declared size")

    def moov(chunk_off: int) -> bytes:
        mvhd = _full(
            b"mvhd",
            struct.pack(">II", 0, 0)  # creation, modification
            + struct.pack(">II", timescale, duration)
            + struct.pack(">I", 0x00010000)  # rate 1.0
            + struct.pack(">H", 0x0100)  # volume
            + b"\x00" * 10
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + struct.pack(">I", 2),  # next track id
        )
        tkhd = _full(
            b"tkhd",
            struct.pack(">II", 0, 0)
            + struct.pack(">I", 1)  # track id
            + struct.pack(">I", 0)
            + struct.pack(">I", duration)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),
            flags=7,
        )
        mdhd = _full(
            b"mdhd",
            struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = _full(
            b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"demux\x00"
        )
        vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
        dref = _full(b"dref", struct.pack(">I", 1) + _full(b"url ", b"", flags=1))
        dinf = _box(b"dinf", dref)
        # stsd: one sample entry whose 4cc is the codec tag ('opqv'
        # opaque / 'jpeg' motion-JPEG — same 16-byte entry either way,
        # so MOOV_BASE is codec-independent)
        entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1))
        stsd = _full(b"stsd", struct.pack(">I", 1) + entry)
        stts = _full(b"stts", struct.pack(">III", 1, n, frame_dur))
        stsz = _full(
            b"stsz",
            struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes.tolist()),
        )
        stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
        stco = _full(b"stco", struct.pack(">II", 1, chunk_off))
        stbl = _box(b"stbl", stsd + stts + stsz + stsc + stco)
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    probe = moov(0)
    assert len(probe) == MOOV_BASE + 4 * n, (len(probe), MOOV_BASE + 4 * n)
    chunk_off = len(_FTYP) + len(probe) + 8  # == mdat_base(n)
    body = moov(chunk_off)
    mdat = _box(b"mdat", b"".join(sample_payloads))
    return _FTYP + body + mdat


def _children(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size, typ = struct.unpack_from(">I4s", data, pos)
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        else:
            hdr = 8
        if size < hdr or pos + size > end:
            raise ValueError(f"malformed box {typ!r} at {pos}")
        yield typ, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, path: list[bytes]) -> tuple[int, int]:
    for typ, s, e in _children(data, start, end):
        if typ == path[0]:
            if len(path) == 1:
                return s, e
            return _find(data, s, e, path[1:])
    raise ValueError(f"box {path[0]!r} not found")


def parse_mp4(data: bytes) -> dict:
    """Demux the first track's sample table.  Returns ``timescale``,
    ``duration`` (mdhd units), and per-sample ``durations`` / ``sizes``
    / ``offsets`` (absolute file offsets) as int64 arrays.  Raises
    ``ValueError`` on anything that is not an ISO-BMFF file with one
    complete sample table."""
    if len(data) < 16 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (no ftyp)")
    end = len(data)
    mdhd_s, mdhd_e = _find(data, 0, end, [b"moov", b"trak", b"mdia", b"mdhd"])
    version = data[mdhd_s]
    if version == 1:
        timescale, duration = struct.unpack_from(">IQ", data, mdhd_s + 4 + 16)
    else:
        timescale, duration = struct.unpack_from(">II", data, mdhd_s + 4 + 8)
    stbl_s, stbl_e = _find(
        data, 0, end, [b"moov", b"trak", b"mdia", b"minf", b"stbl"]
    )
    boxes = {t: (s, e) for t, s, e in _children(data, stbl_s, stbl_e)}

    s, _ = boxes[b"stts"]
    n_runs = struct.unpack_from(">I", data, s + 4)[0]
    runs = np.frombuffer(data, dtype=">u4", count=2 * n_runs, offset=s + 8)
    durations = np.repeat(
        runs[1::2].astype(np.int64), runs[0::2].astype(np.int64)
    )

    s, _ = boxes[b"stsz"]
    fixed, n_samples = struct.unpack_from(">II", data, s + 4)
    if fixed:
        sizes = np.full(n_samples, fixed, dtype=np.int64)
    else:
        sizes = np.frombuffer(
            data, dtype=">u4", count=n_samples, offset=s + 12
        ).astype(np.int64)

    co = boxes.get(b"stco") or boxes.get(b"co64")
    if co is None:
        raise ValueError("no chunk offset box")
    s, _ = co
    n_chunks = struct.unpack_from(">I", data, s + 4)[0]
    if b"stco" in boxes:
        chunk_offs = np.frombuffer(
            data, dtype=">u4", count=n_chunks, offset=s + 8
        ).astype(np.int64)
    else:
        chunk_offs = np.frombuffer(
            data, dtype=">u8", count=n_chunks, offset=s + 8
        ).astype(np.int64)

    s, _ = boxes[b"stsc"]
    n_ent = struct.unpack_from(">I", data, s + 4)[0]
    ent = np.frombuffer(data, dtype=">u4", count=3 * n_ent, offset=s + 8).astype(
        np.int64
    )
    first_chunk, per_chunk = ent[0::3], ent[1::3]
    # expand samples-per-chunk over the chunk list
    run_ends = np.concatenate((first_chunk[1:], [n_chunks + 1]))
    spc = np.repeat(per_chunk, (run_ends - first_chunk))
    if len(spc) != n_chunks or int(spc.sum()) != n_samples:
        raise ValueError("stsc/stco/stsz disagree on sample count")
    # offset of each sample = its chunk offset + sum of earlier sample
    # sizes within the chunk
    chunk_of_sample = np.repeat(np.arange(n_chunks, dtype=np.int64), spc)
    csum = np.concatenate(([0], np.cumsum(sizes[:-1])))
    chunk_first = np.concatenate(([0], np.cumsum(spc[:-1])))
    within = csum - csum[chunk_first][chunk_of_sample]
    offsets = chunk_offs[chunk_of_sample] + within
    if len(durations) != n_samples:
        raise ValueError("stts sample count != stsz sample count")
    # codec 4cc from stsd's first sample entry: payload is
    # version/flags(4) + entry_count(4) + entry(size(4) + 4cc(4) + …)
    codec = ""
    if b"stsd" in boxes:
        s, e = boxes[b"stsd"]
        if e - s >= 16:
            codec = data[s + 12 : s + 16].decode("ascii", "replace")
    return {
        "timescale": int(timescale),
        "duration": int(duration),
        "durations": durations,
        "sizes": sizes,
        "offsets": offsets,
        "codec": codec,
    }
