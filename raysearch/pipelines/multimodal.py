"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
a metadata struct (modality, format, width/height/duration).  The
Ray-side plumbing — schema, actor-pool signature, small batch sizes for
wide binary rows, zero-copy Arrow in/out, output layout — is real and
tested; the actual codec step is STUBBED (no image/audio libraries in
this environment): ``DecodeStage`` raises ``NotImplementedError``
unless constructed with ``fake=True``, in which case it produces a
deterministic fake feature vector (blake2b of the payload bytes folded
into ``feat_dim`` floats), so downstream stages (dedup by feature,
similarity search) can be exercised end-to-end.

Batch-size guidance encoded here: binary payloads make rows wide, so
the stage defaults to ``batch_size=32`` and relies on the streaming
executor + object-store spill rather than large in-heap batches.
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
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.Generator(np.random.PCG64(seed))
    mods = ["image", "audio", "video"]
    fmts = {"image": "png", "audio": "wav", "video": "mp4"}
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        mod = mods[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(256, 2048))).astype(
            np.uint8
        ).tobytes()
        rows["media_id"].append(i)
        rows["modality"].append(mod)
        rows["fmt"].append(fmts[mod])
        rows["width"].append(int(rng.integers(16, 512)) if mod != "audio" else 0)
        rows["height"].append(int(rng.integers(16, 512)) if mod != "audio" else 0)
        rows["duration_ms"].append(int(rng.integers(100, 60000)) if mod != "image" else 0)
        rows["payload"].append(payload)
    return pa.table({f.name: pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA})


def _fold_features(payload: bytes, dim: int = FEAT_DIM) -> np.ndarray:
    digest = hashlib.blake2b(payload, digest_size=dim * 4).digest()
    raw = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
    return raw / np.float64(2**32)


class DecodeStage:
    """Actor-pool decode / feature-extract stage.

    Real deployments construct this with a codec; here the codec step is
    a clearly-marked stub.  ``__init__`` is where a model/codec would
    load ONCE per actor (the ST1 pattern, SURVEY §2.3)."""

    def __init__(self, fake: bool = False, feat_dim: int = FEAT_DIM):
        self.fake = fake
        self.feat_dim = feat_dim
        if not fake:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "construct DecodeStage(fake=True) for the deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            _fold_features(p, self.feat_dim).tolist()
            for p in batch["payload"].to_pylist()
        ]
        sizes = [len(p) for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "modality": batch["modality"],
                "payload_bytes": pa.array(sizes, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def decode_features(ds, fake: bool = True, batch_size: int = DEFAULT_MEDIA_BATCH,
                    concurrency=(1, 4)):
    """media Dataset → (media_id, modality, payload_bytes, feature)."""
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampleStage:
    """Video frame-sampling plumbing: emits one row per sampled frame
    offset (flat_map analog done batch-wise).  Frame DECODE is part of
    the stub; the sampling arithmetic (every ``stride_ms``) is real."""

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
