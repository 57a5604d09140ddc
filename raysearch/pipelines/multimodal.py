"""Multimodal column pipeline: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
a metadata struct (modality, format, width/height/duration); decode /
feature-extract runs as an actor-pool ``map_batches`` stage with small
batch sizes for wide binary rows (the streaming executor + object-store
spill handle memory, not big in-heap batches).

Round 2: the decode step is REAL for PNG images and WAV audio —
pure-stdlib codecs in :mod:`raysearch.pipelines.media_codec` (zlib
scanline inflate + unfilter; RIFF PCM), producing deterministic
16-float feature vectors from actual pixels/samples.

Round 3: baseline JPEG decode is real too (:mod:`jpeg_codec`, numpy
Huffman + IDCT), and the video CONTAINER layer is real — the fixture
writes genuine minimal MP4 files and :class:`DemuxFrameStage`
box-walks their ISO-BMFF sample tables (:mod:`mp4_codec`) to map
stride ticks to sample indices and absolute byte ranges.

Round 4: JPEG decode covers progressive (SOF2) streams too, and
motion-JPEG MP4s decode actual frame pixels
(:class:`VideoFrameDecodeStage`).

Round 5: MPEG-1 intra-coded MP4s (4cc ``mp1v``) decode for real too
(:mod:`mpeg1_codec`), and malformed containers / truncated frame
bytes follow the same skip-and-count contract as unsupported codecs.
The only remaining stub surface is the codec layer external libraries
would provide (inter-frame H.264 entropy decode): per such row the
stage raises ``NotImplementedError`` unless configured to skip — and
the skip-and-count contract (:func:`decode_skip_counts`) makes the
drops auditable, which is the documented default at 100 TB scale
(SURVEY §2.11).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("modality", pa.string()),  # image | audio | video
        ("fmt", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
        ("payload", pa.binary()),
    ]
)

DEFAULT_MEDIA_BATCH = 32
FEAT_DIM = 16


def fake_media_table(n: int = 64, seed: int = 3) -> pa.Table:
    """Deterministic media rows: REAL PNG and baseline-JPEG images
    (random pixels; image rows alternate formats so both decode paths
    run) and REAL 16-bit PCM WAV clips (noisy sine), plus opaque video
    rows whose payload no stdlib codec can decode (honest stub
    surface)."""
    from raysearch.pipelines.jpeg_codec import encode_jpeg
    from raysearch.pipelines.media_codec import encode_png, encode_wav

    rng = np.random.Generator(np.random.PCG64(seed))
    mods = ["image", "audio", "video"]
    fmts = {"image": "png", "audio": "wav", "video": "mp4"}
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    img_i = 0
    for i in range(n):
        mod = mods[i % 3]
        fmt = fmts[mod]
        w = h = dur = 0
        if mod == "image":
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            if img_i % 2:
                fmt = "jpeg"
                payload = encode_jpeg(img, quality=90)
            else:
                payload = encode_png(img)
            img_i += 1
        elif mod == "audio":
            rate = 8000
            dur = int(rng.integers(100, 2000))
            t = np.arange(int(rate * dur / 1000)) / rate
            freq = float(rng.integers(100, 1000))
            sig = 0.5 * np.sin(2 * np.pi * freq * t)
            sig += 0.05 * rng.standard_normal(len(t))
            payload = encode_wav((sig * 32767).astype(np.int16), rate=rate)
        else:
            # REAL minimal MP4 container (round 3, mp4_codec.py): a
            # genuine ftyp/moov/stbl/mdat box structure whose sample
            # table the demux path parses; sample BYTES stay opaque
            # (codec layer honestly unsupported).  Sizes follow the
            # closed form 64 + ((media_id*31 + j*7) % 128) so the SQL
            # oracle can recompute absolute byte offsets.
            from raysearch.pipelines.mp4_codec import encode_mp4

            w, h = int(rng.integers(16, 512)), int(rng.integers(16, 512))
            n_samples = int(rng.integers(3, 1500))  # up to ~60 s at 25 fps
            dur = n_samples * 40  # uniform 25 fps
            sizes = 64 + ((i * 31 + np.arange(n_samples) * 7) % 128)
            payload = encode_mp4(sizes, frame_dur=40, width=w, height=h)
        rows["media_id"].append(i)
        rows["modality"].append(mod)
        rows["fmt"].append(fmt)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
        rows["payload"].append(payload)
    return pa.table({f.name: pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA})


def mjpeg_media_table(n_videos: int = 8, seed: int = 5) -> pa.Table:
    """Deterministic motion-JPEG video rows: genuine MP4 containers
    (codec 4cc ``jpeg``) whose samples are REAL baseline-JPEG frames —
    the decodable video codec path.  Frames are small flat-ish color
    gradients so the JPEG roundtrip error stays tiny and the decoded
    frames are visually checkable in tests."""
    from raysearch.pipelines.jpeg_codec import encode_jpeg
    from raysearch.pipelines.mp4_codec import encode_mp4

    rng = np.random.Generator(np.random.PCG64(seed))
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n_videos):
        w = int(rng.integers(2, 7)) * 8  # multiples of the MCU size
        h = int(rng.integers(2, 7)) * 8
        n_frames = int(rng.integers(3, 12))
        frames = []
        for j in range(n_frames):
            base = int(rng.integers(30, 200))
            img = np.empty((h, w, 3), np.uint8)
            img[:, :, 0] = (base + j * 9) % 256
            img[:, :, 1] = (np.arange(w)[None, :] * 2 + j) % 256
            img[:, :, 2] = (np.arange(h)[:, None] * 3 + base) % 256
            frames.append(encode_jpeg(img, quality=92))
        sizes = np.array([len(f) for f in frames], dtype=np.int64)
        payload = encode_mp4(
            sizes, frames, frame_dur=40, width=w, height=h, codec=b"jpeg"
        )
        rows["media_id"].append(i)
        rows["modality"].append("video")
        rows["fmt"].append("mp4")
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(n_frames * 40)
        rows["payload"].append(payload)
    return pa.table({f.name: pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA})


def mpeg1_media_table(n_videos: int = 6, seed: int = 11) -> pa.Table:
    """Deterministic MPEG-1 video rows: genuine MP4 containers (codec
    4cc ``mp1v``) whose samples are REAL self-contained MPEG-1
    I-frame elementary streams (:mod:`mpeg1_codec`) — the second
    decodable video codec path (round 5, SURVEY §2.11)."""
    from raysearch.pipelines.mp4_codec import encode_mp4
    from raysearch.pipelines.mpeg1_codec import encode_mpeg1_iframe

    rng = np.random.Generator(np.random.PCG64(seed))
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n_videos):
        w = int(rng.integers(1, 4)) * 16  # macroblock multiples
        h = int(rng.integers(1, 4)) * 16
        n_frames = int(rng.integers(3, 10))
        frames = []
        for j in range(n_frames):
            base = int(rng.integers(30, 200))
            img = np.empty((h, w, 3), np.uint8)
            img[:, :, 0] = (base + j * 9) % 256
            img[:, :, 1] = (np.arange(w)[None, :] * 2 + j) % 256
            img[:, :, 2] = (np.arange(h)[:, None] * 3 + base) % 256
            frames.append(encode_mpeg1_iframe(img, quantizer_scale=2))
        sizes = np.array([len(f) for f in frames], dtype=np.int64)
        payload = encode_mp4(
            sizes, frames, frame_dur=40, width=w, height=h, codec=b"mp1v"
        )
        rows["media_id"].append(i)
        rows["modality"].append("video")
        rows["fmt"].append("mp4")
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(n_frames * 40)
        rows["payload"].append(payload)
    return pa.table({f.name: pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA})


def _fold_features(payload: bytes, dim: int = FEAT_DIM) -> np.ndarray:
    digest = hashlib.blake2b(payload, digest_size=dim * 4).digest()
    raw = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
    return raw / np.float64(2**32)


class DecodeStage:
    """Actor-pool decode / feature-extract stage (ST1 pattern: codec
    state would load once per actor in ``__init__``).

    * ``fake=False`` (default): REAL decode — PNG via
      :func:`media_codec.decode_png`, baseline AND progressive JPEG
      via :func:`jpeg_codec.decode_jpeg` (numpy Huffman + IDCT), WAV
      via :func:`media_codec.decode_wav`; formats with no
      stdlib codec (MP4/H.264 video) follow
      ``on_unsupported``: ``"error"`` (raise NotImplementedError, the
      default), ``"skip"`` (drop the row), or ``"fake"``
      (deterministic blake2b-folded vector, clearly tagged by
      feature[0] == 0).
    * ``fake=True``: every row gets the blake2b-folded fake vector
      (plumbing-only mode, kept for contract tests)."""

    SUPPORTED = {"png", "wav", "jpg", "jpeg"}

    def __init__(
        self,
        fake: bool = False,
        feat_dim: int = FEAT_DIM,
        on_unsupported: str = "error",
    ):
        if on_unsupported not in ("error", "skip", "fake"):
            raise ValueError(f"bad on_unsupported {on_unsupported!r}")
        self.fake = fake
        self.feat_dim = feat_dim
        self.on_unsupported = on_unsupported

    def _decode_one(self, fmt: str, payload: bytes) -> np.ndarray | None:
        from raysearch.pipelines.media_codec import (
            audio_features,
            decode_png,
            decode_wav,
            image_features,
        )

        if self.fake:
            return _fold_features(payload, self.feat_dim)
        if fmt == "png":
            return image_features(decode_png(payload), self.feat_dim)
        if fmt in ("jpg", "jpeg"):
            from raysearch.pipelines.jpeg_codec import decode_jpeg

            img = decode_jpeg(payload)
            if img.ndim == 2:  # grayscale → 1-channel for the featurizer
                img = img[:, :, None]
            return image_features(img, self.feat_dim)
        if fmt == "wav":
            return audio_features(*decode_wav(payload), dim=self.feat_dim)
        if self.on_unsupported == "skip":
            return None
        if self.on_unsupported == "fake":
            out = _fold_features(payload, self.feat_dim)
            out[0] = 0.0
            return out
        raise NotImplementedError(
            f"no stdlib codec for format {fmt!r} (png/baseline-jpeg "
            f"images and wav audio are decoded for real; use "
            f"on_unsupported='skip'/'fake' to pass other formats "
            f"through)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "modality": [], "payload_bytes": [], "feature": []}
        for mid, mod, fmt, payload in zip(
            batch["media_id"].to_pylist(),
            batch["modality"].to_pylist(),
            batch["fmt"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            feats = self._decode_one(fmt, payload)
            if feats is None:
                continue
            out["media_id"].append(mid)
            out["modality"].append(mod)
            out["payload_bytes"].append(len(payload))
            out["feature"].append(feats.tolist())
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "modality": pa.array(out["modality"], pa.string()),
                "payload_bytes": pa.array(out["payload_bytes"], pa.int64()),
                "feature": pa.array(out["feature"], pa.list_(pa.float64())),
            }
        )


def decode_features(
    ds,
    fake: bool = False,
    batch_size: int = DEFAULT_MEDIA_BATCH,
    concurrency=(1, 4),
    on_unsupported: str = "skip",
):
    """media Dataset → (media_id, modality, payload_bytes, feature)."""
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"fake": fake, "on_unsupported": on_unsupported},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampleStage:
    """Video frame-sampling plumbing: emits one row per sampled frame
    offset (flat_map analog done batch-wise).  Frame DECODE would need
    an external video codec; the sampling arithmetic (every
    ``stride_ms``) is real."""

    def __init__(self, stride_ms: int = 1000):
        self.stride_ms = stride_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_ms": []}
        for mid, mod, dur in zip(
            batch["media_id"].to_pylist(),
            batch["modality"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if mod != "video":
                continue
            for t in range(0, int(dur), self.stride_ms):
                out["media_id"].append(mid)
                out["frame_ms"].append(t)
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_ms": pa.array(out["frame_ms"], pa.int32()),
            }
        )


def sample_frames(ds, stride_ms: int = 1000, batch_size: int = DEFAULT_MEDIA_BATCH):
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"stride_ms": stride_ms},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


class DemuxFrameStage:
    """REAL container demux (round 3): parse each video payload's MP4
    sample table (:func:`mp4_codec.parse_mp4` — a true ISO-BMFF box
    walker) and map every ``stride_ms`` tick to the sample covering it,
    emitting the sample's index and absolute byte range — exactly what
    a frame extractor hands to the (honestly unsupported) codec layer.
    Non-MP4 video payloads raise, or are dropped with
    ``on_bad="skip"``."""

    def __init__(self, stride_ms: int = 1000, on_bad: str = "error"):
        self.stride_ms = stride_ms
        self.on_bad = on_bad

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raysearch.pipelines.mp4_codec import parse_mp4

        out = {
            "media_id": [],
            "frame_ms": [],
            "sample_idx": [],
            "byte_off": [],
            "byte_len": [],
        }
        for mid, mod, payload in zip(
            batch["media_id"].to_pylist(),
            batch["modality"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if mod != "video":
                continue
            try:
                info = parse_mp4(payload)
            except Exception:
                # any malformed container (not just the parser's own
                # ValueErrors — truncated boxes can surface as
                # struct.error / IndexError) drops under "skip"
                if self.on_bad == "skip":
                    continue
                raise
            scale = info["timescale"]
            ends_ms = np.cumsum(info["durations"]) * 1000 // scale
            total_ms = int(ends_ms[-1]) if len(ends_ms) else 0
            ticks = np.arange(0, total_ms, self.stride_ms, dtype=np.int64)
            idx = np.searchsorted(ends_ms, ticks, side="right")
            out["media_id"].extend([mid] * len(ticks))
            out["frame_ms"].extend(ticks.tolist())
            out["sample_idx"].extend(idx.tolist())
            out["byte_off"].extend(info["offsets"][idx].tolist())
            out["byte_len"].extend(info["sizes"][idx].tolist())
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_ms": pa.array(out["frame_ms"], pa.int64()),
                "sample_idx": pa.array(out["sample_idx"], pa.int64()),
                "byte_off": pa.array(out["byte_off"], pa.int64()),
                "byte_len": pa.array(out["byte_len"], pa.int64()),
            }
        )


def demux_frames(
    ds,
    stride_ms: int = 1000,
    batch_size: int = DEFAULT_MEDIA_BATCH,
    on_bad: str = "error",
):
    """Video frame table via real MP4 demux: (media_id, frame_ms,
    sample_idx, byte_off, byte_len) for every ``stride_ms`` tick."""
    return ds.map_batches(
        DemuxFrameStage,
        fn_constructor_kwargs={"stride_ms": stride_ms, "on_bad": on_bad},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


#: video codec 4cc → per-sample pure-numpy frame decoder
def _decode_mjpeg_sample(data: bytes) -> np.ndarray:
    from raysearch.pipelines.jpeg_codec import decode_jpeg

    return decode_jpeg(data)


def _decode_mpeg1_sample(data: bytes) -> np.ndarray:
    from raysearch.pipelines.mpeg1_codec import decode_mpeg1_iframe

    return decode_mpeg1_iframe(data)


VIDEO_DECODERS = {
    "jpeg": _decode_mjpeg_sample,
    "mp1v": _decode_mpeg1_sample,
}


class VideoFrameDecodeStage:
    """REAL video-frame decode: demux each MP4's sample table, pick
    the sample covering every ``stride_ms`` tick, and decode the
    frame's actual pixels + feature vector for the codecs with a
    pure-numpy decoder (``VIDEO_DECODERS``): motion-JPEG (stsd 4cc
    ``jpeg``, samples are baseline JPEGs, round 4) and MPEG-1 intra
    (4cc ``mp1v``, samples are self-contained I-frame elementary
    streams, round 5 — :mod:`mpeg1_codec`).  Inter-coded codecs
    (H.264 etc.) follow ``on_unsupported``: ``"skip"`` (the documented
    default at scale — rows drop and the companion
    :func:`decode_skip_counts` makes the drops auditable) or
    ``"error"`` (SURVEY §2.11)."""

    def __init__(
        self,
        stride_ms: int = 1000,
        feat_dim: int = FEAT_DIM,
        on_unsupported: str = "skip",
    ):
        if on_unsupported not in ("error", "skip"):
            raise ValueError(f"bad on_unsupported {on_unsupported!r}")
        self.stride_ms = stride_ms
        self.feat_dim = feat_dim
        self.on_unsupported = on_unsupported

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raysearch.pipelines.media_codec import image_features
        from raysearch.pipelines.mp4_codec import parse_mp4

        out = {
            "media_id": [], "frame_ms": [], "sample_idx": [],
            "width": [], "height": [], "feature": [],
        }
        for mid, mod, payload in zip(
            batch["media_id"].to_pylist(),
            batch["modality"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if mod != "video":
                continue
            # corrupt / non-ISO-BMFF payloads follow the SAME
            # skip-and-count contract as unsupported codecs (round 5,
            # ADVICE r04): a malformed container must drop a row, not
            # kill the batch — at 100 TB "one bad file fails the
            # stage" is not an acceptable failure mode.
            try:
                info = parse_mp4(payload)
            except Exception:
                if self.on_unsupported == "skip":
                    continue
                raise
            decoder = VIDEO_DECODERS.get(info["codec"])
            if decoder is None:
                if self.on_unsupported == "skip":
                    continue
                raise NotImplementedError(
                    f"no pure-Python decode for video codec "
                    f"{info['codec']!r} (motion-JPEG 'jpeg' and MPEG-1 "
                    f"intra 'mp1v' decode for real; use "
                    f"on_unsupported='skip' to drop and count other "
                    f"codecs)"
                )
            scale = info["timescale"]
            ends_ms = np.cumsum(info["durations"]) * 1000 // scale
            total_ms = int(ends_ms[-1]) if len(ends_ms) else 0
            ticks = np.arange(0, total_ms, self.stride_ms, dtype=np.int64)
            idx = np.searchsorted(ends_ms, ticks, side="right")
            for t, s in zip(ticks.tolist(), idx.tolist()):
                off = int(info["offsets"][s])
                ln = int(info["sizes"][s])
                try:
                    img = decoder(payload[off : off + ln])
                except Exception:
                    # truncated / corrupt frame bytes: drop this FRAME
                    # under "skip" (the media row keeps its good frames)
                    if self.on_unsupported == "skip":
                        continue
                    raise
                if img.ndim == 2:
                    img = img[:, :, None]
                out["media_id"].append(mid)
                out["frame_ms"].append(t)
                out["sample_idx"].append(s)
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["feature"].append(
                    image_features(img, self.feat_dim).tolist()
                )
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_ms": pa.array(out["frame_ms"], pa.int64()),
                "sample_idx": pa.array(out["sample_idx"], pa.int64()),
                "width": pa.array(out["width"], pa.int32()),
                "height": pa.array(out["height"], pa.int32()),
                "feature": pa.array(out["feature"], pa.list_(pa.float64())),
            }
        )


def decode_video_frames(
    ds,
    stride_ms: int = 1000,
    batch_size: int = DEFAULT_MEDIA_BATCH,
    on_unsupported: str = "skip",
):
    """Decoded video-frame features via demux + motion-JPEG decode:
    (media_id, frame_ms, sample_idx, width, height, feature)."""
    return ds.map_batches(
        VideoFrameDecodeStage,
        fn_constructor_kwargs={
            "stride_ms": stride_ms,
            "on_unsupported": on_unsupported,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


def decode_skip_counts(ds):
    """The skip-and-count contract for ``on_unsupported="skip"``
    pipelines: per format, how many rows the real-decode layer handles
    vs drops — (fmt, n_rows, n_decoded, n_skipped), sorted by fmt.
    Per-block partials then one tiny groupby (bounded by the number of
    distinct formats); makes silent skips auditable at any scale.

    Contract semantics (deliberate): ``n_decoded`` is the STATIC
    per-format capability count — rows whose ``fmt`` is in
    ``DecodeStage.SUPPORTED`` — not a per-row decode outcome.  A
    supported-format row can still fail in the decode layer (e.g. an
    interlaced PNG raises ``NotImplementedError``, a corrupt payload
    raises in the codec); those failures surface from the decode stage
    itself under ITS ``on_unsupported``/``on_bad`` policy.  Keeping
    this operator metadata-only is what lets it skip the ``payload``
    column entirely (a fmt-column-only scan at 100 TB vs re-decoding
    the corpus just to count)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    supported = list(DecodeStage.SUPPORTED)

    def partial(b: pa.Table) -> pa.Table:
        fmt = b["fmt"]
        dec = pc.is_in(fmt, value_set=pa.array(supported, pa.string()))
        ones = np.ones(b.num_rows, np.int64)
        dec_np = dec.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "fmt": fmt,
                "n_rows": pa.array(ones, pa.int64()),
                "n_decoded": pa.array(dec_np, pa.int64()),
                "n_skipped": pa.array(ones - dec_np, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_decoded", alias_name="n_decoded"),
            Sum("n_skipped", alias_name="n_skipped"),
        )
        .sort("fmt")
    )
