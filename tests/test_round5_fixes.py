"""Round-5 regression tests: media_demux output order pinned across
partitionings (the round-4 gate's one red row — VERDICT r04 #1) and the
corrupt-container skip-and-count contract (ADVICE r04: a malformed MP4
payload must drop under ``skip``, not kill the batch)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _frame_hash(df: pd.DataFrame) -> str:
    """Order-SENSITIVE value hash (mirrors the driver gate's check)."""
    df = df[sorted(df.columns)]
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()


def test_media_demux_deterministic_across_partitionings(ray_session):
    """The gate path (demux_frames + pinned sort) must emit
    byte-identical output regardless of input partitioning — the exact
    defect class that made media_demux the one red r04 gate row."""
    import ray.data as rd

    from raysearch.pipelines.multimodal import demux_frames, fake_media_table

    tbl = fake_media_table(24)
    hashes = []
    for n_blocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(n_blocks)
        out = (
            demux_frames(ds)
            .sort(["media_id", "frame_ms"])
            .to_pandas()
        )
        assert len(out) > 0
        hashes.append(_frame_hash(out))
    assert hashes[0] == hashes[1], (
        "media_demux output is partitioning-dependent (order not pinned)"
    )


def _media_with_corrupt_video(n_good: int = 4, frame_trunc: bool = False) -> pa.Table:
    """MJPEG videos plus malformed payloads: pure garbage (no ftyp)
    and a mid-moov truncation (malformed box walk).  With
    ``frame_trunc`` also a copy whose CONTAINER parses but whose mdat
    frame bytes are cut off — the sample table points past EOF, so
    demux succeeds but per-frame decode must skip."""
    from raysearch.pipelines.multimodal import MEDIA_SCHEMA, mjpeg_media_table

    good = mjpeg_media_table(n_good)
    pay = good["payload"].to_pylist()
    rows = {f.name: good[f.name].to_pylist() for f in MEDIA_SCHEMA}
    next_id = max(rows["media_id"]) + 1
    bads = [b"\x00garbage not an mp4 at all", pay[0][:200]]
    if frame_trunc:
        from raysearch.pipelines.mp4_codec import parse_mp4

        info = parse_mp4(pay[0])
        # keep the full box structure up to the first sample, then cut
        bads.append(pay[0][: int(info["offsets"][0]) + 4])
    for bad in bads:
        rows["media_id"].append(next_id)
        rows["modality"].append("video")
        rows["fmt"].append("mp4")
        rows["width"].append(0)
        rows["height"].append(0)
        rows["duration_ms"].append(0)
        rows["payload"].append(bad)
        next_id += 1
    return pa.table({f.name: pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA})


def test_demux_skips_corrupt_containers(ray_session):
    """demux_frames(on_bad='skip') drops malformed payloads and keeps
    every frame of the good ones; on_bad='error' raises."""
    import ray.data as rd

    from raysearch.pipelines.multimodal import demux_frames

    tbl = _media_with_corrupt_video(4)
    ds = rd.from_arrow(tbl).repartition(3)
    out = demux_frames(ds, stride_ms=40, on_bad="skip").to_pandas()
    good_ids = set(tbl["media_id"].to_pylist()[:4])
    assert set(out["media_id"]) == good_ids
    with pytest.raises(Exception):
        demux_frames(
            rd.from_arrow(tbl), stride_ms=40, on_bad="error"
        ).materialize()


def test_video_decode_skips_corrupt_containers_and_frames(ray_session):
    """decode_video_frames(on_unsupported='skip') survives corrupt
    containers AND truncated frame bytes; 'error' raises on them."""
    import ray.data as rd

    from raysearch.pipelines.multimodal import (
        decode_video_frames,
        mjpeg_media_table,
    )

    tbl = _media_with_corrupt_video(4, frame_trunc=True)
    out = decode_video_frames(
        rd.from_arrow(tbl).repartition(3), stride_ms=40
    ).to_pandas()
    good = mjpeg_media_table(4)
    durs = dict(
        zip(good["media_id"].to_pylist(), good["duration_ms"].to_pylist())
    )
    assert len(out) == sum(d // 40 for d in durs.values())
    assert set(out["media_id"]) == set(durs)
    with pytest.raises(Exception):
        decode_video_frames(
            rd.from_arrow(tbl), stride_ms=40, on_unsupported="error"
        ).materialize()


def test_epoch_shuffle_deterministic_and_seed_distinct(ray_session):
    """The shuffled order is a pure function of (id, seed): identical
    rows at any partitioning, oracle-identical to the DuckDB twin, and
    a different seed yields an unrelated permutation (not a rotation)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.sampling import epoch_shuffle, epoch_shuffle_sql

    n = 400
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(["en", "es", "fr", "de"] * (n // 4)),
    })

    outs = []
    for n_blocks in (1, 7):
        ds = epoch_shuffle(rd.from_arrow(tbl).repartition(n_blocks), seed=3,
                           keep_cols=["lang"])
        outs.append(ds.to_pandas())
    assert outs[0].equals(outs[1])

    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(epoch_shuffle_sql(3, keep_cols=["lang"])).fetchdf()
    got = outs[0][orc.columns]
    assert got.reset_index(drop=True).equals(orc)

    # permutation, not a sample: every id exactly once
    assert sorted(outs[0]["doc_id"]) == list(range(n))

    other = epoch_shuffle(rd.from_arrow(tbl), seed=4).to_pandas()
    a = outs[0]["doc_id"].to_numpy()
    b = other["doc_id"].to_numpy()
    # unrelated permutations: few fixed points between epochs, and not
    # a rotation of each other (xor enters before the multiply)
    assert (a == b).mean() < 0.05
    shift = np.flatnonzero(b == a[0])[0]
    assert not np.array_equal(np.roll(b, -shift), a)


def test_group_sample_k_deterministic_and_short_groups(ray_session):
    """Per-group bottom-k: identical rows at any partitioning, oracle
    match, and groups smaller than k return all their rows."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.sampling import group_sample_k, group_sample_k_sql

    n = 300
    langs = ["en"] * 200 + ["es"] * 96 + ["xx"] * 4  # xx shorter than k
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(langs),
    })

    outs = []
    for n_blocks in (1, 6):
        ds = group_sample_k(rd.from_arrow(tbl).repartition(n_blocks), 10)
        outs.append(ds.to_pandas())
    assert outs[0].equals(outs[1])

    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(group_sample_k_sql(10)).fetchdf()
    got = outs[0][orc.columns].reset_index(drop=True)
    assert got.equals(orc)

    counts = outs[0].groupby("lang")["doc_id"].count()
    assert counts["en"] == 10 and counts["es"] == 10 and counts["xx"] == 4


def test_normalize_text_matches_duckdb_and_edge_cases(ray_session):
    """Arrow NFC/lower/collapse/trim chain equals the DuckDB twin,
    including unicode composition, tabs/newlines, and empty strings."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.textstats import normalize_sql, normalize_text

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "  Hello\t\tWORLD \n twice  ",
            "Café MIXED case",       # combining accent -> NFC
            "",
            "\n\n\t",
        ]),
    })
    got = normalize_text(rd.from_arrow(tbl).repartition(2)).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(normalize_sql() + " ORDER BY doc_id").fetchdf()
    assert got[orc.columns].equals(orc)
    assert got.loc[0, "norm_text"] == "hello world twice"
    assert got.loc[1, "norm_text"] == "café mixed case"
    assert got.loc[2, "norm_text"] == "" and got.loc[3, "norm_text"] == ""


def test_pmi_topk_matches_duckdb_and_min_count(ray_session):
    """PMI collocation top-k equals the DuckDB twin on a corpus with a
    planted collocation; pairs below the support floor are excluded."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.textstats import pmi_topk, pmi_topk_sql

    docs = (
        ["alpha beta filler one", "alpha beta filler two"] * 3  # n=6
        + ["gamma delta rare pair"] * 2                          # n=2 < 5
        + ["one two alpha", "two one beta", "filler one two"] * 4
    )
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    })
    got = (
        pmi_topk(rd.from_arrow(tbl).repartition(3), k=10)
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(pmi_topk_sql(10)).fetchdf()
    assert got[orc.columns].equals(orc)
    pairs = set(zip(got["w1"], got["w2"]))
    assert ("alpha", "beta") in pairs          # planted collocation
    assert ("gamma", "delta") not in pairs     # below min_count=5
    assert got["pmi_qi"].is_monotonic_decreasing


def test_vocab_overlap_matches_duckdb_and_empty_source(ray_session):
    """Source-vocabulary Jaccard matrix equals the DuckDB twin,
    including an all-empty source (registers with n=0, jaccard 0)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.textstats import vocab_overlap, vocab_overlap_sql

    tbl = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "source": pa.array(["a", "a", "b", "b", "c", "z"]),
        "text": pa.array([
            "cat dog fish", "dog bird",
            "cat dog", "whale",
            "unique words only here",
            "",                       # source z: zero terms
        ]),
    })
    got = (
        vocab_overlap(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(vocab_overlap_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    by_pair = {(r.src_a, r.src_b): r for r in got.itertuples()}
    ab = by_pair[("a", "b")]
    # a={cat,dog,fish,bird}, b={cat,dog,whale}: 2 shared / 5 union
    assert ab.n_a == 4 and ab.n_b == 3 and ab.n_shared == 2
    assert ab.jaccard == 0.4
    az = by_pair[("a", "z")]
    assert az.n_b == 0 and az.n_shared == 0 and az.jaccard == 0.0
    assert len(got) == 6  # all C(4,2) pairs incl. zero-overlap ones


def test_chunk_manifest_matches_duckdb_and_tiles(ray_session):
    """Per-(chunk, doc) gather rows equal the DuckDB twin; slices tile
    every chunk gaplessly and cover every doc's tokens exactly."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.packing import chunk_manifest, chunk_manifest_sql

    texts = ["one two three", "", "a b c d e f g", "x", "p q r s t",
             "lone", "alpha beta gamma delta epsilon zeta eta theta"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    got = (
        chunk_manifest(rd.from_arrow(tbl).repartition(3), seq_len=4,
                       bucket_size=2)
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(chunk_manifest_sql(4)).fetchdf()
    assert got[orc.columns].equals(orc)
    # tiling: within each chunk the slices are contiguous from 0 and
    # sum to seq_len (except the final, partial chunk)
    total_tokens = sum(len(t.split()) for t in texts)
    for cid, g in got.groupby("chunk_id"):
        g = g.sort_values("doc_id")
        starts = g["chunk_off"].to_numpy()
        lens = g["n"].to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == (starts + lens)[:-1]).all()
        if cid < got["chunk_id"].max():
            assert lens.sum() == 4
    # coverage: per doc the slices concatenate to [0, n_tokens)
    for did, g in got.groupby("doc_id"):
        g = g.sort_values("chunk_id")
        assert g["doc_off"].iloc[0] == 0
        assert (g["doc_off"].to_numpy()[1:]
                == (g["doc_off"] + g["n"]).to_numpy()[:-1]).all()
        assert g["n"].sum() == len(texts[did].split())
    assert got["n"].sum() == total_tokens
    assert 1 not in set(got["doc_id"])  # empty doc emits nothing


def test_pmi_topk_broadcast_and_join_paths_identical(ray_session, monkeypatch):
    """The bounded-broadcast fast path and the copartition hash-join
    path emit identical rows (the scale path is forced by dropping the
    broadcast limit to 0)."""
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines import textstats

    docs = (
        ["alpha beta filler one", "alpha beta filler two"] * 3
        + ["one two alpha", "two one beta", "filler one two"] * 4
    )
    tbl = pa.table({"text": pa.array(docs)})
    fast = (
        textstats.pmi_topk(rd.from_arrow(tbl).repartition(3), k=10)
        .to_pandas()
        .reset_index(drop=True)
    )
    monkeypatch.setattr(textstats, "UNIGRAM_BROADCAST_LIMIT", 0)
    joined = (
        textstats.pmi_topk(rd.from_arrow(tbl).repartition(3), k=10)
        .to_pandas()
        .reset_index(drop=True)
    )
    assert fast.equals(joined)
    assert len(fast) > 0


def test_zipf_buckets_matches_duckdb(ray_session):
    """log2 frequency-of-frequencies equals the DuckDB twin; bands
    partition the vocabulary and the token mass exactly."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.textstats import zipf_buckets, zipf_buckets_sql

    docs = (["the cat sat"] * 5 + ["the dog ran far"] * 3
            + ["lone words here appear once"])
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    })
    got = (
        zipf_buckets(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(zipf_buckets_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    total_tokens = sum(len(t.split()) for t in docs)
    assert got["n_tokens"].sum() == total_tokens
    # "the" occurs 8 times -> bucket 3 present
    assert 3 in set(got["bucket"])


def test_js_divergence_matches_duckdb(ray_session):
    """Pairwise JSD equals the DuckDB twin, including an identical
    pair (jsd 0), a disjoint pair (jsd ln 2) and an empty source."""
    import math

    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.textstats import js_divergence, js_divergence_sql

    tbl = pa.table({
        "doc_id": pa.array(range(7), pa.int64()),
        "source": pa.array(["a", "a", "b", "c", "c", "d", "z"]),
        "text": pa.array([
            "cat dog cat", "fish",
            "cat dog cat fish",        # b == a's pooled distribution
            "whale squid", "kraken",   # c disjoint from a
            "cat dog mixed things",
            "",                        # z: empty source
        ]),
    })
    got = (
        js_divergence(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(js_divergence_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    by_pair = {(r.src_a, r.src_b): r.jsd_qi9 for r in got.itertuples()}
    assert by_pair[("a", "b")] == 0                       # same distribution
    ln2_qi = round(0.5 * math.log(2.0) * 1e9)
    # disjoint: every term contributes p*ln2; per-term rounding keeps
    # the total within a few units of ln(2)*1e9
    assert abs(by_pair[("a", "c")] - 2 * ln2_qi) <= 8
    assert ("a", "z") in by_pair                          # empty source pairs exist
    assert len(got) == 10                                 # C(5,2)


def test_lexical_diversity_matches_duckdb(ray_session):
    """Per-doc TTR / hapax metrics equal the DuckDB twin, including an
    all-hapax doc (ttr_q = 1e9), a one-word-repeated doc and an
    empty-text doc (all-zero row, kept by the LEFT JOIN)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.textstats import (
        lexical_diversity,
        lexical_diversity_sql,
    )

    tbl = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array([
            "cat dog fish",          # all hapax: ttr = hapax = 1
            "cat cat cat cat",       # 1 type / 4 tokens, 0 hapax
            "the the cat dog dog",   # 3 types, 1 hapax, 5 tokens
            "",                      # empty: zero row
            "A.a b,B c",             # case-fold + punct split: a a b b c
        ]),
    })
    got = (
        lexical_diversity(rd.from_arrow(tbl).repartition(3))
        .sort("doc_id")
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(lexical_diversity_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    r0 = got.iloc[0]
    assert (r0.n_tokens, r0.n_types, r0.n_hapax) == (3, 3, 3)
    assert r0.ttr_q == 1_000_000_000 and r0.hapax_q == 1_000_000_000
    r1 = got.iloc[1]
    assert (r1.n_types, r1.n_hapax, r1.ttr_q) == (1, 0, 250_000_000)
    r2 = got.iloc[2]
    assert (r2.ttr_q, r2.hapax_q) == (600_000_000, 200_000_000)
    assert tuple(got.iloc[3][1:]) == (0, 0, 0, 0, 0)
    r4 = got.iloc[4]
    assert (r4.n_tokens, r4.n_types, r4.n_hapax) == (5, 3, 1)


def test_char_entropy_matches_duckdb(ray_session):
    """Per-char integer-scaled entropy equals the DuckDB twin,
    including a zero-entropy doc (one repeated char), an empty doc
    (all-zero row) and a unicode doc (codepoint counting parity)."""
    import math

    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.textstats import char_entropy, char_entropy_sql

    tbl = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array([
            "aaaa",            # one symbol: entropy 0
            "abab",            # two equiprobable: ln 2
            "",                # empty: zero row
            "héllo wörld",    # unicode codepoints
            "abcd",            # four distinct: ln 4
        ]),
    })
    got = (
        char_entropy(rd.from_arrow(tbl).repartition(3))
        .sort("doc_id")
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(char_entropy_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    assert got.iloc[0].entropy_qi9 == 0
    assert tuple(got.iloc[2][1:]) == (0, 0, 0)
    ln2 = round(0.5 * math.log(2.0) * 1e9)
    assert abs(got.iloc[1].entropy_qi9 - 2 * ln2) <= 4
    ln4 = round(0.25 * math.log(4.0) * 1e9)
    assert abs(got.iloc[4].entropy_qi9 - 4 * ln4) <= 8
    r3 = got.iloc[3]
    assert r3.n_chars == 11 and r3.n_distinct_chars == 9


def test_vocab_growth_matches_duckdb(ray_session):
    """First-occurrence novelty counts equal the DuckDB twin; docs
    introducing nothing new emit no row; totals sum to the vocabulary
    size."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.textstats import vocab_growth, vocab_growth_sql

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "cat dog",
            "dog cat",            # nothing new -> no row
            "cat fish",           # fish is new
            "",                   # empty -> no row
            "whale fish Dog!",    # whale new (dog case-folds)
        ]),
    })
    got = (
        vocab_growth(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(vocab_growth_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    assert list(got["doc_id"]) == [0, 2, 4]
    assert list(got["new_terms"]) == [2, 1, 1]
    assert got["new_terms"].sum() == 4  # cat dog fish whale


def test_temperature_mix_matches_duckdb(ray_session):
    """tau=2 resampling plan equals the DuckDB twin; quotas conserve
    the corpus size within floor losses; low-resource sources are
    upweighted (some doc repeats) and the dominant source is
    downweighted (some doc drops)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.sampling import (
        _temperature_plan,
        temperature_mix,
        temperature_mix_sql,
    )

    n_a, n_b, n_c = 64, 16, 4
    tbl = pa.table({
        "doc_id": pa.array(range(n_a + n_b + n_c), pa.int64()),
        "source": pa.array(["a"] * n_a + ["b"] * n_b + ["c"] * n_c),
    })
    got = (
        temperature_mix(rd.from_arrow(tbl).repartition(3), temperature=2.0)
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(temperature_mix_sql(temperature=2.0)).fetchdf()
    assert got[orc.columns].equals(orc)
    # quotas: sqrt weights 8:4:2 over N=84 -> targets 48/24/12
    plan = _temperature_plan({"a": n_a, "b": n_b, "c": n_c}, 2.0)
    assert plan["b"][0] == 1 and plan["c"][0] == 3  # upweighted bases
    # sqrt(16x) = 4*sqrt(x) exactly in IEEE, so targets are exactly
    # 48/24/12; the fractional tails are hash-approximate (+-O(1)
    # for the low-discrepancy Fibonacci key on sequential ids)
    total = got["n_copies"].sum()
    assert abs(total - 84) <= 8  # conserves corpus size
    by_src = got.groupby("source")["n_copies"].sum()
    assert by_src["a"] < n_a          # dominant source downweighted
    assert by_src["c"] > n_c          # low-resource source upweighted


def test_rollup_counts_matches_duckdb(ray_session):
    """All prefix levels equal the UNION-ALL twin; every level's
    counts sum to the corpus size; the grand total is one row."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.relational import (
        rollup_counts,
        rollup_counts_sql,
    )

    tbl = pa.table({
        "lang": pa.array(["en", "en", "es", "es", "en", "de"]),
        "source": pa.array(["web", "web", "web", "book", "book", "web"]),
    })
    got = (
        rollup_counts(rd.from_arrow(tbl).repartition(3), ["lang", "source"])
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(rollup_counts_sql(["lang", "source"])).fetchdf()
    assert got[orc.columns].equals(orc)
    for lvl in (0, 1, 2):
        assert got[got.level == lvl]["n"].sum() == 6
    grand = got[got.level == 2]
    assert len(grand) == 1 and grand.iloc[0]["n"] == 6
    assert set(grand[["lang", "source"]].iloc[0]) == {"(all)"}


def test_funnel_counts_matches_duckdb(ray_session):
    """Strict-order funnel reach equals the min-after CTE twin: a
    full-funnel user, an out-of-order user (view before signup only),
    an equal-timestamp user (strict > blocks the step) and a
    repeat-step user (later occurrence can still advance)."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.relational import funnel_counts, funnel_counts_sql

    t0 = pd.Timestamp("2026-01-01")
    rows = [
        # u1: s(0) v(1) c(2): reaches 3
        (1, 0, "signup"), (1, 1, "view"), (1, 2, "click"),
        # u2: v(0) s(1): view precedes signup -> level 1 only
        (2, 0, "view"), (2, 1, "signup"),
        # u3: s(0) v(0): equal ts -> strict > blocks view; level 1
        (3, 0, "signup"), (3, 0, "view"),
        # u4: s(0) v(0) v(5) c(6) p(7): second view advances; level 4
        (4, 0, "signup"), (4, 0, "view"), (4, 5, "view"),
        (4, 6, "click"), (4, 7, "purchase"),
        # u5: only noise events -> filtered out entirely
        (5, 0, "error"),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([t0 + pd.Timedelta(minutes=r[1]) for r in rows]),
        "event_type": pa.array([r[2] for r in rows]),
    })
    steps = ["signup", "view", "click", "purchase"]
    got = (
        funnel_counts(rd.from_arrow(tbl).repartition(3), steps)
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", tbl)
    orc = con.execute(funnel_counts_sql(steps)).fetchdf()
    assert got[orc.columns].equals(orc)
    assert list(got["n_users"]) == [4, 2, 2, 1]


def test_prefix_jaccard_pairs_complete_and_matches_duckdb(ray_session):
    """Prefix filtering finds EXACTLY the pairs the quadratic exact
    operator finds (completeness is the point), including near-dup
    pairs, and a hot shingle shared by every doc must not create
    spurious work or missed pairs.  Result equals the shared DuckDB
    oracle with pinned order."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.dedup import (
        jaccard_pairs_exact,
        prefix_jaccard_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        base,                                   # 0 ~ 1 near-dup
        base + " tonight",                      # 1
        "completely different words here with nothing shared at all",  # 2
        "completely different words here with nothing shared today",   # 3: ~2
        "the quick brown unrelated tail of tokens diverges from both", # 4
    ]
    # every doc shares one hot trigram ("the quick brown" appears in
    # 0, 1, 4) — plus add a universal sentence to stress the hot path
    docs = [d + " common suffix shingle" for d in docs]
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
    })
    ds = rd.from_arrow(tbl).repartition(3)
    got = prefix_jaccard_pairs(ds, threshold=0.6, shingle=3).to_pandas()
    ref = jaccard_pairs_exact(
        rd.from_arrow(tbl).repartition(2), threshold=0.6, shingle=3
    ).to_pandas()
    assert got.reset_index(drop=True).equals(
        ref.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (0, 1) in pairs          # near-dup found
    assert (2, 3) not in pairs      # J = 6/13 < 0.6: correctly excluded

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod_pjp", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(m.oracle_sql()["prefix_jaccard_pairs"]).fetchdf()
    assert got[orc.columns].reset_index(drop=True).equals(orc)


def test_retention_cohorts_matches_duckdb(ray_session):
    """Cohort triangle equals the integer-bucket twin: two cohorts,
    returning and churned users, multiple events in one period count
    once."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.relational import (
        WEEK_US,
        retention_cohorts,
        retention_cohorts_sql,
    )

    t0 = pd.Timestamp("2026-01-05")  # within some epoch week w0
    wk = pd.Timedelta(microseconds=WEEK_US)
    rows = [
        # u1: cohort w0, active w0 and w0+2
        (1, t0), (1, t0 + pd.Timedelta(hours=1)), (1, t0 + 2 * wk),
        # u2: cohort w0 only (churned)
        (2, t0),
        # u3: cohort w0+1, active w0+1 and w0+2
        (3, t0 + wk), (3, t0 + wk + pd.Timedelta(minutes=5)),
        (3, t0 + 2 * wk),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    got = (
        retention_cohorts(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", tbl)
    orc = con.execute(retention_cohorts_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    w0 = int(t0.value // 1000 // WEEK_US)
    tri = {(r.cohort_week, r.weeks_since): r.n_users for r in got.itertuples()}
    assert tri[(w0, 0)] == 2          # u1 + u2 start in w0
    assert tri[(w0, 2)] == 1          # only u1 returns (once, not 2x)
    assert tri[(w0 + 1, 0)] == 1 and tri[(w0 + 1, 1)] == 1  # u3
    assert (w0, 1) not in tri         # nobody active in w0+1 from w0


def test_anti_join_matches_duckdb_and_edge_cases(ray_session):
    """Anti-join keeps exactly the unmatched left rows (NOT EXISTS
    twin), preserves dtypes through the tagged union, and handles an
    empty right side (everything kept)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.relational import anti_join, anti_join_sql

    customer = pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "c_name": pa.array([f"c{i}" for i in range(1, 6)]),
    })
    orders = pa.table({
        "o_custkey": pa.array([2, 2, 4], pa.int64()),
    })
    got = anti_join(
        rd.from_arrow(customer).repartition(3),
        rd.from_arrow(orders).repartition(2),
        left_key="c_custkey", right_key="o_custkey",
        columns=["c_custkey", "c_name"],
    ).to_pandas()
    con = duckdb.connect()
    con.register("customer", customer)
    con.register("orders", orders)
    orc = con.execute(anti_join_sql(
        left_table="customer", right_table="orders",
        left_key="c_custkey", right_key="o_custkey",
        columns=["c_custkey", "c_name"],
    )).fetchdf()
    assert got[orc.columns].reset_index(drop=True).equals(orc)
    assert list(got["c_custkey"]) == [1, 3, 5]
    assert str(got["c_custkey"].dtype) == "int64"

    empty = pa.table({"o_custkey": pa.array([], pa.int64())})
    all_kept = anti_join(
        rd.from_arrow(customer), rd.from_arrow(empty),
        left_key="c_custkey", right_key="o_custkey",
        columns=["c_custkey", "c_name"],
    ).to_pandas()
    assert list(all_kept["c_custkey"]) == [1, 2, 3, 4, 5]


def test_percentile_ranks_matches_duckdb(ray_session):
    """Exact percent_rank/cume_dist equal the window twin, ties share
    ranks, min gets pr 0 and max gets cd 1e9."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.profile import (
        percentile_ranks,
        percentile_ranks_sql,
    )

    vals = [5, 3, 3, 9, 1, 3, 9, 7]
    tbl = pa.table({
        "doc_id": pa.array(range(len(vals)), pa.int64()),
        "n_chars": pa.array(vals, pa.int64()),
    })
    got = (
        percentile_ranks(rd.from_arrow(tbl).repartition(3), "n_chars")
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(percentile_ranks_sql("n_chars")).fetchdf()
    assert got[orc.columns].equals(orc)
    by_id = {r.doc_id: (r.pr_qi, r.cd_qi) for r in got.itertuples()}
    assert by_id[4] == (0, 125_000_000)               # min value 1
    assert by_id[3] == by_id[6]                       # ties share rank
    assert by_id[3][1] == 1_000_000_000               # max: cd = 1
    # value 3 (three ties): count_less=1 -> pr = 1e9//7
    assert by_id[1][0] == 1_000_000_000 // 7
