"""Round-4 regression tests: pinned output order on pair-emitting
operators (byte-identical output across differently-partitioned runs),
the connected-components round-budget guard, and the bounded
top_customers dim handling."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _synth_docs(n: int = 120, seed: int = 7) -> pa.Table:
    """Deterministic corpus with planted near-dup pairs so the LSH
    operators emit a non-trivial pair set."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(60)]
    texts = []
    for i in range(n):
        words = rng.choice(vocab, size=14).tolist()
        texts.append(" ".join(words))
    # planted near-dups: copy with one word changed
    for i in range(0, n, 10):
        base = texts[i].split()
        base[3] = "zz"
        texts[i + 1] = " ".join(base)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _frame_hash(df: pd.DataFrame) -> str:
    """Order-SENSITIVE value hash (mirrors the driver gate's check)."""
    df = df[sorted(df.columns)]
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()


@pytest.mark.parametrize(
    "op_name",
    ["minhash_lsh_pairs", "simhash_pairs", "ngram_jaccard_pairs"],
)
def test_pair_ops_deterministic_across_partitionings(ray_session, op_name):
    import ray.data as rd

    from raysearch.pipelines import dedup

    op = getattr(dedup, op_name)
    tbl = _synth_docs()
    hashes = []
    for n_blocks in (1, 13):
        ds = rd.from_arrow(tbl).repartition(n_blocks)
        out = op(ds).to_pandas()
        assert len(out) > 0, f"{op_name} emitted no pairs on planted dups"
        hashes.append(_frame_hash(out))
    assert hashes[0] == hashes[1], (
        f"{op_name} output is partitioning-dependent (order not pinned)"
    )


def test_embedding_near_dup_deterministic_across_partitionings(ray_session):
    import ray.data as rd

    from raysearch.pipelines.dedup import embedding_near_dup

    rng = np.random.default_rng(3)
    n, dim = 80, 16
    vecs = rng.normal(size=(n, dim))
    # planted near-dups
    for i in range(0, n, 8):
        vecs[i + 1] = vecs[i] + rng.normal(scale=0.01, size=dim)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
        }
    )
    hashes = []
    for n_blocks in (1, 9):
        ds = rd.from_arrow(tbl).repartition(n_blocks)
        out = embedding_near_dup(
            ds, threshold=0.9, n_planes=4, n_tables=8, multiprobe=1
        ).to_pandas()
        assert len(out) > 0
        hashes.append(_frame_hash(out))
    assert hashes[0] == hashes[1]


def test_connected_components_raises_when_rounds_exhausted(ray_session):
    import ray.data as rd

    from raysearch.pipelines.dedup import connected_components

    # a path graph of length 8 has diameter 8 — 2 rounds cannot
    # converge, and the guard must raise rather than return split labels
    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(range(8), pa.int64()),
                "doc_b": pa.array(range(1, 9), pa.int64()),
            }
        )
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(pairs, max_rounds=2, driver_limit=0)
    # and with budget it converges to a single component
    labels = connected_components(pairs, max_rounds=64, driver_limit=0)
    pdf = labels.to_pandas()
    assert pdf["label"].nunique() == 1


def test_top_customers_wide_dim_bounded(ray_session):
    """top_customers must not pull the dimension to the driver: with a
    wide customer table the result still attaches exactly the k
    winners' names (keys broadcast, dim filtered distributed)."""
    import ray.data as rd

    from raysearch.pipelines.relational import top_customers

    n_cust = 5000
    rng = np.random.default_rng(11)
    orders = rd.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, size=20000), pa.int64()
                ),
                "o_totalprice": pa.array(
                    rng.uniform(1, 1000, size=20000), pa.float64()
                ),
            }
        )
    ).repartition(7)
    customer = rd.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(n_cust)], pa.string()
                ),
            }
        )
    ).repartition(5)
    out = top_customers(orders, customer, k=10).to_pandas()
    assert len(out) == 10
    assert out["c_name"].notna().all()
    assert (
        out["c_name"]
        == out["o_custkey"].map(lambda i: f"Customer#{i:09d}")
    ).all()
    # descending spend, custkey tiebreak
    assert list(out["total_spent"]) == sorted(out["total_spent"], reverse=True)


def test_mjpeg_video_frame_decode_real(ray_session):
    """Motion-JPEG MP4 → demux → REAL per-frame JPEG decode: every
    sampled frame's feature vector must equal decode_jpeg applied to
    the demuxed byte range, and the decoded pixels must be close to
    the encoder's source frames (JPEG is lossy but the fixture frames
    are smooth gradients)."""
    import ray.data as rd

    from raysearch.pipelines.jpeg_codec import decode_jpeg, encode_jpeg
    from raysearch.pipelines.media_codec import image_features
    from raysearch.pipelines.mp4_codec import encode_mp4, parse_mp4
    from raysearch.pipelines.multimodal import (
        decode_video_frames,
        mjpeg_media_table,
    )

    tbl = mjpeg_media_table(4)
    out = (
        decode_video_frames(rd.from_arrow(tbl), stride_ms=40)
        .to_pandas()
        .sort_values(["media_id", "frame_ms"])
        .reset_index(drop=True)
    )
    assert len(out) > 0
    payloads = {m: p for m, p in zip(tbl["media_id"].to_pylist(),
                                     tbl["payload"].to_pylist())}
    # one frame per 40 ms tick per video
    durs = {m: d for m, d in zip(tbl["media_id"].to_pylist(),
                                 tbl["duration_ms"].to_pylist())}
    assert len(out) == sum(d // 40 for d in durs.values())
    for _, row in out.iterrows():
        info = parse_mp4(payloads[row.media_id])
        assert info["codec"] == "jpeg"
        off = int(info["offsets"][row.sample_idx])
        ln = int(info["sizes"][row.sample_idx])
        img = decode_jpeg(payloads[row.media_id][off : off + ln])
        assert (img.shape[1], img.shape[0]) == (row.width, row.height)
        np.testing.assert_allclose(
            np.asarray(row.feature), image_features(img, 16), rtol=0, atol=0
        )

    # pixel fidelity vs a known source frame
    src = np.zeros((16, 16, 3), np.uint8)
    src[:, :, 0] = 100
    src[:, :, 1] = (np.arange(16)[None, :] * 2) % 256
    src[:, :, 2] = (np.arange(16)[:, None] * 3) % 256
    jb = encode_jpeg(src, quality=92)
    mp4 = encode_mp4([len(jb)], [jb], codec=b"jpeg", width=16, height=16)
    info = parse_mp4(mp4)
    dec = decode_jpeg(mp4[info["offsets"][0] : info["offsets"][0] + info["sizes"][0]])
    assert np.abs(dec.astype(int) - src.astype(int)).mean() < 8.0


def test_video_decode_skip_and_error_contract(ray_session):
    """Opaque-codec MP4s: on_unsupported='skip' drops them (the
    documented default at scale) and decode_skip_counts makes the
    drops auditable; on_unsupported='error' raises."""
    import ray.data as rd

    from raysearch.pipelines.multimodal import (
        decode_skip_counts,
        decode_video_frames,
        fake_media_table,
    )

    media = rd.from_arrow(fake_media_table(24))
    # fake_media_table videos are 'opqv' — all skipped, no error
    out = decode_video_frames(media, stride_ms=1000).to_pandas()
    assert len(out) == 0
    with pytest.raises(Exception, match="opqv"):
        decode_video_frames(
            media, on_unsupported="error"
        ).materialize()
    counts = decode_skip_counts(media).to_pandas().set_index("fmt")
    assert counts.loc["mp4", "n_skipped"] == counts.loc["mp4", "n_rows"]
    for fmt in ("png", "jpeg", "wav"):
        assert counts.loc[fmt, "n_skipped"] == 0
        assert counts.loc[fmt, "n_decoded"] == counts.loc[fmt, "n_rows"]
    assert counts["n_rows"].sum() == 24


# ---------------------------------------------------------------------------
# progressive JPEG (round 4): SOF2 multi-scan decode with spectral
# selection + successive approximation
# ---------------------------------------------------------------------------


def _test_images():
    rng = np.random.default_rng(21)
    imgs = [
        # smooth gradient (few AC coefs, long EOB runs)
        (np.arange(24)[None, :, None] * 10 + np.arange(16)[:, None, None] * 5)
        .astype(np.uint8)
        .repeat(3, axis=2),
        # pure noise (dense AC, exercises ZRL + refinement interleave)
        rng.integers(0, 256, size=(17, 23, 3)).astype(np.uint8),
        # grayscale
        rng.integers(0, 256, size=(9, 31)).astype(np.uint8),
        # flat block (all-zero AC everywhere)
        np.full((8, 8, 3), 130, np.uint8),
    ]
    return imgs


@pytest.mark.parametrize("successive", [True, False])
@pytest.mark.parametrize("quality", [92, 60])
def test_progressive_jpeg_equals_baseline(successive, quality):
    """A progressive stream of the same image/quality carries the SAME
    quantized coefficients as the baseline stream, so decode must be
    bit-identical between the two paths."""
    from raysearch.pipelines.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    for img in _test_images():
        base = decode_jpeg(encode_jpeg(img, quality=quality))
        prog_bytes = encode_jpeg_progressive(
            img, quality=quality, successive=successive
        )
        # really SOF2 on the wire
        assert b"\xff\xc2" in prog_bytes[:200]
        prog = decode_jpeg(prog_bytes)
        np.testing.assert_array_equal(base, prog)


def test_progressive_jpeg_multiscan_structure():
    """The progressive stream carries the expected number of SOS scans
    (1 DC first + 2 AC bands x ncomp + DC refine + AC refine x ncomp)."""
    from raysearch.pipelines.jpeg_codec import encode_jpeg_progressive

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    b = encode_jpeg_progressive(img, successive=True)
    assert b.count(b"\xff\xda") == 1 + 2 * 3 + 1 + 3
    gray = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    bg = encode_jpeg_progressive(gray, successive=False)
    assert bg.count(b"\xff\xda") == 1 + 2


def test_decode_stage_handles_progressive_payload(ray_session):
    """DecodeStage feature-extracts a progressive JPEG payload exactly
    like the equivalent baseline payload (no skip, no error)."""
    import ray.data as rd

    from raysearch.pipelines.jpeg_codec import encode_jpeg, encode_jpeg_progressive
    from raysearch.pipelines.multimodal import MEDIA_SCHEMA, decode_features

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(24, 24, 3)).astype(np.uint8)
    rows = {
        "media_id": [0, 1],
        "modality": ["image", "image"],
        "fmt": ["jpeg", "jpeg"],
        "width": [24, 24],
        "height": [24, 24],
        "duration_ms": [0, 0],
        "payload": [encode_jpeg(img, 85), encode_jpeg_progressive(img, 85)],
    }
    tbl = pa.table({f.name: pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA})
    out = decode_features(rd.from_arrow(tbl)).to_pandas().set_index("media_id")
    assert len(out) == 2
    np.testing.assert_array_equal(
        np.asarray(out.loc[0, "feature"]), np.asarray(out.loc[1, "feature"])
    )


@pytest.mark.parametrize("size", [(16, 16), (17, 23), (8, 9), (33, 31)])
def test_jpeg_420_roundtrip_fidelity(size):
    """4:2:0 encode → decode: correct shape at odd/even dims, luma and
    (smooth) chroma close to the source."""
    from raysearch.pipelines.jpeg_codec import decode_jpeg, encode_jpeg

    h, w = size
    img = np.empty((h, w, 3), np.uint8)
    img[:, :, 0] = (np.arange(w)[None, :] * 3) % 256
    img[:, :, 1] = (np.arange(h)[:, None] * 5) % 256
    img[:, :, 2] = 90
    dec = decode_jpeg(encode_jpeg(img, quality=92, subsampling="420"))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int)).mean()
    assert err < 12.0, err


@pytest.mark.parametrize("successive", [True, False])
def test_progressive_420_equals_baseline_420(successive):
    """Progressive 4:2:0 carries the same quantized coefficients as
    baseline 4:2:0 — decode must be bit-identical (exercises the
    MCU-interleaved DC scans and per-component AC grids)."""
    from raysearch.pipelines.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(31)
    for hw in ((16, 16), (19, 27)):
        img = rng.integers(0, 256, size=(*hw, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=70, subsampling="420"))
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, quality=70, successive=successive, subsampling="420"
            )
        )
        np.testing.assert_array_equal(base, prog)


def test_jpeg_444_unchanged_by_subsampling_param():
    """subsampling='444' must produce the exact bytes the pre-round-4
    encoder produced (the MJPEG fixtures and media goldens depend on
    byte stability)."""
    from raysearch.pipelines.jpeg_codec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(12, 20, 3)).astype(np.uint8)
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85, subsampling="444")
    dec = decode_jpeg(encode_jpeg(img, 85))
    assert dec.shape == img.shape


def test_jpeg_422_roundtrip_and_progressive():
    """4:2:2 (horizontal-only chroma subsampling) decodes correctly in
    both baseline and progressive paths."""
    from raysearch.pipelines.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(41)
    img = np.empty((21, 18, 3), np.uint8)
    img[:, :, 0] = (np.arange(18)[None, :] * 7) % 256
    img[:, :, 1] = (np.arange(21)[:, None] * 4) % 256
    img[:, :, 2] = 160
    base = decode_jpeg(encode_jpeg(img, quality=92, subsampling="422"))
    assert base.shape == img.shape
    assert np.abs(base.astype(int) - img.astype(int)).mean() < 12.0
    noisy = rng.integers(0, 256, size=(13, 22, 3)).astype(np.uint8)
    b = decode_jpeg(encode_jpeg(noisy, quality=70, subsampling="422"))
    p = decode_jpeg(
        encode_jpeg_progressive(noisy, quality=70, subsampling="422")
    )
    np.testing.assert_array_equal(b, p)


def test_png_palette_and_16bit_decode():
    """Palette (PLTE + optional tRNS) and 16-bit PNGs decode (round
    4); fixtures are built chunk-by-chunk so the decoder is tested
    against the wire format, not the encoder."""
    import struct
    import zlib

    from raysearch.pipelines.media_codec import _PNG_SIG, _chunk, decode_png

    rng = np.random.default_rng(17)
    # --- palette image ---
    h, w, n_pal = 9, 13, 7
    pal = rng.integers(0, 256, size=(n_pal, 3)).astype(np.uint8)
    idx = rng.integers(0, n_pal, size=(h, w)).astype(np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(png), pal[idx])
    # with tRNS alpha
    trns = np.array([0, 255, 128], np.uint8)
    png_a = (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"tRNS", trns.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    dec = decode_png(png_a)
    assert dec.shape == (h, w, 4)
    np.testing.assert_array_equal(dec[:, :, :3], pal[idx])
    exp_alpha = np.full(n_pal, 255, np.uint8)
    exp_alpha[:3] = trns
    np.testing.assert_array_equal(dec[:, :, 3], exp_alpha[idx])
    # --- 16-bit RGB (filter 0 and filter 2 rows) ---
    img16 = rng.integers(0, 65536, size=(6, 5, 3)).astype(np.uint16)
    be = img16.byteswap().view(np.uint8).reshape(6, 5 * 6) if \
        img16.dtype.byteorder != ">" else img16.view(np.uint8)
    rows = []
    prev = np.zeros(5 * 6, np.uint8)
    for y in range(6):
        if y % 2 == 0:
            rows.append(b"\x00" + be[y].tobytes())
        else:  # Up filter on byte level
            rows.append(
                b"\x02" + ((be[y].astype(np.int16) - prev) % 256)
                .astype(np.uint8).tobytes()
            )
        prev = be[y]
    png16 = (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 16, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(
        decode_png(png16), (img16 >> 8).astype(np.uint8)
    )


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_jpeg_restart_markers_roundtrip(subsampling):
    """DRI + RSTn restart markers: the decoder must byte-align, skip
    the marker and reset DC prediction at every interval; decode must
    be bit-identical to the no-restart stream of the same image."""
    from raysearch.pipelines.jpeg_codec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(51)
    img = rng.integers(0, 256, size=(40, 56, 3)).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, 80, subsampling=subsampling))
    for ri in (1, 3, 7):
        b = encode_jpeg(
            img, 80, subsampling=subsampling, restart_interval=ri
        )
        assert b"\xff\xdd" in b  # DRI present
        assert b.count(b"\xff\xd0") + sum(
            b.count(bytes([0xFF, 0xD0 + i])) for i in range(1, 8)
        ) > 0
        np.testing.assert_array_equal(decode_jpeg(b), plain)


def test_contamination_flags_hand_computed(ray_session):
    """Decontamination: planted benchmark doc, an exact copy, a
    partial overlap below threshold, and a clean doc."""
    import ray.data as rd

    from raysearch.pipelines.dedup import contamination_flags

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        bench_text,                                   # 0: the benchmark doc
        bench_text,                                   # 1: exact copy — 6 shingles overlap
        "alpha beta gamma nothing else here at all",  # 2: 1 shingle overlap
        "completely unrelated words in this one doc", # 3: clean
        "tiny",                                       # 4: <3 tokens, empty set
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    bench = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([0], pa.int64()),
             "text": pa.array([bench_text], pa.string())}
        )
    )
    out = (
        contamination_flags(docs, bench, shingle=3, min_overlap=5)
        .to_pandas()
        .set_index("doc_id")
    )
    assert list(out.index) == [0, 1, 2, 3, 4]  # sorted, every doc present
    assert out.loc[0, "n_overlap"] == 6 and out.loc[0, "contaminated"]
    assert out.loc[1, "n_overlap"] == 6 and out.loc[1, "contaminated"]
    assert out.loc[2, "n_overlap"] == 1 and not out.loc[2, "contaminated"]
    assert out.loc[3, "n_overlap"] == 0 and not out.loc[3, "contaminated"]
    assert out.loc[4, "n_overlap"] == 0 and not out.loc[4, "contaminated"]
