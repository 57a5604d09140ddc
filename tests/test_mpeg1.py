"""MPEG-1 intra codec (round 5, SURVEY §2.11): VLC-table sanity,
encode/decode roundtrips incl. in-stream quantizer matrix and escape
coding, the inter-picture NotImplementedError boundary, and the
end-to-end mp1v MP4 decode through the Ray actor-pool stage."""

from __future__ import annotations

import numpy as np
import pytest

from raysearch.pipelines.mpeg1_codec import (
    _AC_CODES,
    _AC_EOB,
    _AC_ESCAPE,
    _DC_SIZE_CHROMA,
    _DC_SIZE_LUMA,
    _MB_INC,
    _MB_INC_ESCAPE,
    _MB_STUFFING,
    decode_mpeg1_iframe,
    encode_mpeg1_iframe,
)


def _assert_prefix_free(codes: list[str], name: str) -> None:
    cs = sorted(codes)
    for i, a in enumerate(cs):
        for b in cs[i + 1 :]:
            assert not b.startswith(a), f"{name}: {a!r} is a prefix of {b!r}"


def test_vlc_tables_prefix_free():
    _assert_prefix_free(list(_AC_CODES) + [_AC_EOB, _AC_ESCAPE], "AC")
    _assert_prefix_free(
        list(_MB_INC) + [_MB_INC_ESCAPE, _MB_STUFFING], "MB_INC"
    )
    _assert_prefix_free(list(_DC_SIZE_LUMA), "DC_LUMA")
    _assert_prefix_free(list(_DC_SIZE_CHROMA), "DC_CHROMA")
    # every (run, 1..) family the spec defines exactly once
    assert len(set(_AC_CODES.values())) == len(_AC_CODES)


def test_flat_image_roundtrips_exact():
    img = np.full((32, 48, 3), 128, np.uint8)
    out = decode_mpeg1_iframe(encode_mpeg1_iframe(img, 8))
    assert out.shape == (32, 48, 3)
    assert int(np.abs(out.astype(int) - 128).max()) == 0


def test_gradient_roundtrip_tight():
    gx = np.linspace(0, 255, 64).astype(np.uint8)
    img = np.stack([np.tile(gx, (64, 1))] * 3, axis=2)
    out = decode_mpeg1_iframe(encode_mpeg1_iframe(img, 4))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_noise_luma_error_is_quantization_bounded():
    """Gray noise exercises escape codes and the long AC tail; with
    qs=1 luma reconstruction error must stay within quantization
    bounds (chroma is exactly 128, so RGB error == luma error)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (48, 80), np.uint8)
    out = decode_mpeg1_iframe(encode_mpeg1_iframe(img, 1))
    y = 0.299 * out[:, :, 0] + 0.587 * out[:, :, 1] + 0.114 * out[:, :, 2]
    assert float(np.abs(y - img).mean()) < 3.0
    assert float(np.abs(y - img).max()) < 20.0


def test_custom_intra_matrix_in_stream():
    flatq = np.full(64, 16, np.int64)
    flatq[0] = 8
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32), np.uint8)
    out = decode_mpeg1_iframe(
        encode_mpeg1_iframe(img, 1, intra_matrix=flatq)
    )
    y = 0.299 * out[:, :, 0] + 0.587 * out[:, :, 1] + 0.114 * out[:, :, 2]
    assert float(np.abs(y - img).mean()) < 2.0


def test_non_macroblock_sizes_crop_back():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (30, 41, 3), np.uint8)
    out = decode_mpeg1_iframe(encode_mpeg1_iframe(img, 2))
    assert out.shape == (30, 41, 3)


def test_inter_picture_raises_not_implemented():
    from raysearch.pipelines import mpeg1_codec as M

    w = M._Writer()
    w.start_code(M._SEQ)
    w.bits(16, 12)
    w.bits(16, 12)
    w.bits(1, 4)
    w.bits(3, 4)
    w.bits(0x3FFFF, 18)
    w.bits(1, 1)
    w.bits(0, 10)
    w.bits(0, 1)
    w.bits(0, 1)
    w.bits(0, 1)
    w.start_code(M._PIC)
    w.bits(0, 10)
    w.bits(2, 3)  # P picture
    w.bits(0, 16)
    w.bits(0, 1)
    with pytest.raises(NotImplementedError):
        decode_mpeg1_iframe(bytes(w.out))


def test_malformed_stream_raises_value_error():
    with pytest.raises(ValueError):
        decode_mpeg1_iframe(b"\x00\x00\x01\xb3")  # truncated seq header
    with pytest.raises(ValueError):
        decode_mpeg1_iframe(b"not a stream at all")


def test_determinism():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    assert encode_mpeg1_iframe(img, 4) == encode_mpeg1_iframe(img, 4)


def test_mp1v_video_decodes_through_ray_stage(ray_session):
    """End-to-end: mp1v MP4 rows decode actual frames via the actor
    pool; mixed with MJPEG rows both codecs decode; opaque codecs and
    inter-coded samples still skip-and-count."""
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.multimodal import (
        MEDIA_SCHEMA,
        decode_video_frames,
        mjpeg_media_table,
        mpeg1_media_table,
    )

    m1 = mpeg1_media_table(4)
    mj = mjpeg_media_table(3)
    # re-id the mjpeg rows so media_id stays unique in the union
    rows = {f.name: m1[f.name].to_pylist() for f in MEDIA_SCHEMA}
    off = max(rows["media_id"]) + 1
    for f in MEDIA_SCHEMA:
        vals = mj[f.name].to_pylist()
        if f.name == "media_id":
            vals = [v + off for v in vals]
        rows[f.name].extend(vals)
    tbl = pa.table(
        {f.name: pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA}
    )
    out = decode_video_frames(
        rd.from_arrow(tbl).repartition(3), stride_ms=40
    ).to_pandas()
    durs = dict(zip(rows["media_id"], rows["duration_ms"]))
    assert len(out) == sum(d // 40 for d in durs.values())
    assert set(out["media_id"]) == set(durs)
    # features are real per-frame values, not fill
    assert out["feature"].map(len).nunique() == 1
    assert (out["width"] > 0).all() and (out["height"] > 0).all()
