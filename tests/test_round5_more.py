"""Round-5 late additions: sliding_chunks (RAG window chunking),
ngram_novelty (first-occurrence n-gram profile) and
edit_distance_pairs (exact banded Levenshtein near-dup) — each checked
against its DuckDB twin, across partitionings, and on edge cases the
sf corpora don't exercise (empty docs, bucket-straddling lengths,
non-ASCII text)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _doc_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )


# ---------------------------------------------------------------------------
# sliding_chunks
# ---------------------------------------------------------------------------


def test_sliding_chunks_matches_duckdb_and_edges(ray_session):
    """Window arithmetic equals the SQL twin for empty, short, exactly
    window-sized, one-over and long docs; last chunk reaches the final
    token; no chunk is a suffix of its predecessor."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.packing import sliding_chunks, sliding_chunks_sql

    w, s = 5, 3
    texts = [
        "",                                  # 0 tokens -> no chunks
        "a b c",                             # n < w -> one chunk [0, 3)
        "a b c d e",                         # n == w -> one chunk [0, 5)
        "a b c d e f",                       # n == w+1 -> [0,5) + [3,6)
        " ".join(f"t{i}" for i in range(17)),  # long
    ]
    tbl = _doc_table(texts)
    got = (
        sliding_chunks(rd.from_arrow(tbl).repartition(3), window=w, stride=s)
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(sliding_chunks_sql(w, s)).fetchdf()
    assert got[orc.columns].equals(orc)
    assert not (got["doc_id"] == 0).any()                      # empty doc
    assert list(got[got["doc_id"] == 3]["tok_start"]) == [0, 3]
    long = got[got["doc_id"] == 4]
    assert long["tok_end"].iloc[-1] == 17                      # reaches end
    # every consecutive chunk adds at least one new token
    assert (long["tok_end"].diff().dropna() > 0).all()


def test_sliding_chunks_validates_params(ray_session):
    import ray.data as rd

    from raysearch.pipelines.packing import sliding_chunks

    ds = rd.from_arrow(_doc_table(["a b"]))
    with pytest.raises(ValueError):
        sliding_chunks(ds, window=4, stride=5)   # stride > window
    with pytest.raises(ValueError):
        sliding_chunks(ds, window=0, stride=0)


# ---------------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------------


def test_ngram_novelty_matches_duckdb_and_planted_dup(ray_session):
    """A verbatim duplicate introduces nothing (novelty 0); the corpus
    opener introduces everything (novelty 1); a doc with < k tokens is
    absent; values equal the DuckDB string-shingle twin."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.dedup import ngram_novelty, ngram_novelty_sql

    texts = [
        "the quick brown fox jumps over the lazy dog",   # opener: all novel
        "an entirely different second document body here",
        "the quick brown fox jumps over the lazy dog",   # dup of doc 0
        "the quick brown fox sat very still today",      # partial overlap
        "too short",                                     # < 3 tokens: absent
    ]
    tbl = _doc_table(texts)
    got = (
        ngram_novelty(rd.from_arrow(tbl).repartition(3), shingle=3)
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(ngram_novelty_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    by_id = got.set_index("doc_id")
    assert 4 not in by_id.index
    assert by_id.loc[0, "novelty"] == 1.0
    assert by_id.loc[2, "novelty"] == 0.0 and by_id.loc[2, "n_novel"] == 0
    assert by_id.loc[2, "n_shingles"] == by_id.loc[0, "n_shingles"]
    assert 0.0 < by_id.loc[3, "novelty"] < 1.0


def test_ngram_novelty_sf0001_slice_matches_duckdb(ray_session):
    """The real sf0.001 corpus through the full distributed plan."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.dedup import ngram_novelty, ngram_novelty_sql

    p = "/root/testdata/sf0.001/documents.parquet"
    docs = rd.read_parquet(p, columns=["doc_id", "text"])
    got = ngram_novelty(docs, shingle=3).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    orc = con.execute(ngram_novelty_sql()).fetchdf()
    assert got[orc.columns].equals(orc)


# ---------------------------------------------------------------------------
# edit_distance_pairs
# ---------------------------------------------------------------------------


def _lev_reference(a: str, b: str) -> int:
    """Plain quadratic DP, the textbook reference."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def test_lev_capped_matches_reference():
    """Capped numpy DP equals the textbook DP whenever dist <= k, and
    returns k+1 (never an undershoot) when the true distance exceeds
    the cap — fuzzed over random mutation pairs incl. non-ASCII."""
    from raysearch.pipelines.dedup import _lev_capped

    rng = np.random.default_rng(7)
    alpha = list("abcdé文 xyz")
    for trial in range(60):
        n = int(rng.integers(0, 40))
        a = "".join(rng.choice(alpha, size=n))
        b = list(a)
        for _ in range(int(rng.integers(0, 8))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, max(len(b), 1)))
            if op == 0 and b:
                b[pos % len(b)] = str(rng.choice(alpha))
            elif op == 1:
                b.insert(pos, str(rng.choice(alpha)))
            elif b:
                del b[pos % len(b)]
        b = "".join(b)
        true = _lev_reference(a, b)
        for k in (0, 2, 5, 50):
            got = _lev_capped(a, b, k)
            assert got == (true if true <= k else k + 1), (a, b, k)


def test_edit_distance_pairs_matches_duckdb_and_bucket_straddle(ray_session):
    """Engine pairs equal the exhaustive DuckDB ``levenshtein`` twin,
    including a pair whose lengths straddle a length-bucket boundary
    (the canonical-bucket emission rule) and identical docs (dist 0);
    each qualifying pair is emitted exactly once."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.dedup import (
        edit_distance_pairs,
        edit_distance_pairs_sql,
    )

    d = 10
    base = "x" * 9               # len 9: buckets {0, 1} at width 10
    straddle = "x" * 11          # len 11: buckets {1, 2} -> shared bucket 1
    texts = [
        base,
        straddle,                            # dist 2 from base
        "completely unrelated content that is rather long indeed",
        base,                                # exact dup of doc 0 (dist 0)
        "x" * 9 + "yyyyy",                   # dist 5 from doc 0
    ]
    tbl = _doc_table(texts)
    got = (
        edit_distance_pairs(rd.from_arrow(tbl).repartition(3), max_dist=d)
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(edit_distance_pairs_sql(d)).fetchdf()
    assert got[orc.columns].equals(orc)
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (0, 1) in pairs                       # bucket straddle found
    assert (0, 3) in pairs and (1, 3) in pairs   # exact dup
    assert len(pairs) == len(got)                # emitted exactly once


def test_edit_distance_pairs_sf0001_slice_matches_duckdb(ray_session):
    """A 100-doc slice of the real sf0.001 corpus (doc_id % 5 == 0)
    through the full distributed plan vs the exhaustive oracle."""
    import duckdb
    import pyarrow.compute as pc
    import ray.data as rd

    from raysearch.pipelines.dedup import (
        edit_distance_pairs,
        edit_distance_pairs_sql,
    )

    p = "/root/testdata/sf0.001/documents.parquet"

    def sl(b: pa.Table) -> pa.Table:
        ids = pc.cast(b["doc_id"], pa.int64())
        keep = pc.equal(
            pc.subtract(
                ids, pc.multiply(pc.divide(ids, pa.scalar(5, pa.int64())),
                                 pa.scalar(5, pa.int64()))
            ),
            pa.scalar(0, pa.int64()),
        )
        return b.filter(keep)

    docs = rd.read_parquet(p, columns=["doc_id", "text"]).map_batches(
        sl, batch_format="pyarrow"
    )
    got = edit_distance_pairs(docs, max_dist=30).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    orc = con.execute(
        edit_distance_pairs_sql(
            30, table="(SELECT * FROM documents WHERE doc_id % 5 = 0)"
        )
    ).fetchdf()
    assert got[orc.columns].equals(orc)


def test_edit_distance_pairs_deterministic_across_partitionings(ray_session):
    """Same bytes regardless of input partitioning (the gate's
    order/dtype determinism contract)."""
    import hashlib

    import ray.data as rd

    from raysearch.pipelines.dedup import edit_distance_pairs

    texts = ["alpha beta " + "z" * i for i in range(20)] + ["alpha beta z"]
    tbl = _doc_table(texts)
    hashes = []
    for n_blocks in (1, 6):
        df = (
            edit_distance_pairs(rd.from_arrow(tbl).repartition(n_blocks), 8)
            .to_pandas()
        )
        df = df[sorted(df.columns)]
        hashes.append(
            hashlib.md5(df.to_csv(index=False).encode()).hexdigest()
        )
    assert hashes[0] == hashes[1]
    assert len(set(hashes)) == 1


# ---------------------------------------------------------------------------
# vocab_encode
# ---------------------------------------------------------------------------


def test_vocab_encode_matches_duckdb_oov_and_ties(ray_session):
    """Top-V vocabulary pins ties (count desc, term asc), OOV encodes
    as -1, positions follow token order, empty docs emit nothing —
    all equal to the DuckDB twin."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.features import (
        build_vocab,
        vocab_encode,
        vocab_encode_sql,
    )

    texts = [
        "bb aa bb cc",          # bb:2
        "aa cc dd bb",          # aa:2 cc:2 dd:1 -> tie aa/bb/cc broken asc
        "",                     # empty: no rows
        "ee dd aa",             # ee rare -> OOV at V=3
    ]
    tbl = _doc_table(texts)
    ds = rd.from_arrow(tbl).repartition(2)
    vocab = build_vocab(ds, vocab_size=3)
    # counts: aa=3 bb=3 cc=3 dd=2 ee=1 -> top3 = aa,bb,cc (tie asc)
    assert vocab["term"].to_pylist() == ["aa", "bb", "cc"]
    assert vocab["token_id"].to_pylist() == [0, 1, 2]

    got = vocab_encode(ds, vocab_size=3).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(vocab_encode_sql(3)).fetchdf()
    assert got[orc.columns].equals(orc)
    assert not (got["doc_id"] == 2).any()
    row3 = got[got["doc_id"] == 3]
    assert list(row3["token_id"]) == [-1, -1, 0]   # ee,dd OOV; aa id 0
    assert list(row3["pos"]) == [0, 1, 2]


def test_vocab_encode_deterministic_across_partitionings(ray_session):
    import hashlib

    import ray.data as rd

    from raysearch.pipelines.features import vocab_encode

    texts = [f"w{i % 7} w{(i + 1) % 5} common" for i in range(30)]
    tbl = _doc_table(texts)
    hashes = []
    for n_blocks in (1, 5):
        df = vocab_encode(
            rd.from_arrow(tbl).repartition(n_blocks), vocab_size=4
        ).to_pandas()
        df = df[sorted(df.columns)]
        hashes.append(hashlib.md5(df.to_csv(index=False).encode()).hexdigest())
    assert len(set(hashes)) == 1


# ---------------------------------------------------------------------------
# convstats (role_stats / conv_dedup / tool_stats / turn_gap_stats)
# ---------------------------------------------------------------------------


def _conv_table():
    """Tiny transcript corpus with a planted duplicate conversation
    (c3 == c1 content in the same turn order), shuffled row order, a
    single-turn conversation and an empty tool field."""
    rows = [
        # conv, turn, role, text, tool, ts_us
        ("c1", 1, "assistant", "beta gamma", "", 2_000_000),
        ("c1", 0, "user", "alpha one", "", 1_000_000),
        ("c2", 0, "user", "solo turn", "", 5_000_000),
        ("c3", 0, "user", "alpha one", "", 9_000_000),
        ("c3", 1, "tool", "beta gamma", "grep", 12_000_000),
        ("c4", 1, "tool", "zz", "grep", 8_000_000),
        ("c4", 0, "tool", "yy", "ls", 7_000_000),
    ]
    import pyarrow as pa

    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
        }
    )


def test_conv_dedup_matches_duckdb_and_planted_dup(ray_session):
    """c3 duplicates c1's ordered content (role/ts differ — content
    hash covers TEXT in turn order only): c1 keeps (min conv_id), c3
    drops; ordering is by turn_idx, not input row order."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.convstats import conv_dedup, conv_dedup_sql

    tbl = _conv_table()
    got = (
        conv_dedup(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", tbl)
    orc = con.execute(conv_dedup_sql("corpus")).fetchdf()
    assert got[orc.columns].equals(orc)
    by = got.set_index("conv_id")
    assert by.loc["c1", "content_hash"] == by.loc["c3", "content_hash"]
    assert bool(by.loc["c1", "keep"]) and not bool(by.loc["c3", "keep"])
    assert bool(by.loc["c2", "keep"]) and bool(by.loc["c4", "keep"])


def test_role_and_tool_stats_match_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.convstats import (
        role_stats,
        role_stats_sql,
        tool_stats,
        tool_stats_sql,
    )

    tbl = _conv_table()
    ds = rd.from_arrow(tbl).repartition(3)
    con = duckdb.connect()
    con.register("corpus", tbl)

    got = role_stats(ds).to_pandas().reset_index(drop=True)
    orc = con.execute(role_stats_sql("corpus")).fetchdf()
    assert got[orc.columns].equals(orc)
    by = got.set_index("role")
    assert by.loc["user", "n_convs"] == 3       # c1, c2, c3
    assert by.loc["tool", "n_turns"] == 3       # c3 x1 + c4 x2

    got_t = tool_stats(ds).to_pandas().reset_index(drop=True)
    orc_t = con.execute(tool_stats_sql("corpus")).fetchdf()
    assert got_t[orc_t.columns].equals(orc_t)
    byt = got_t.set_index("tool")
    assert byt.loc["grep", "n_calls"] == 2 and byt.loc["grep", "n_convs"] == 2
    assert byt.loc["ls", "n_calls"] == 1


def test_turn_gap_stats_matches_duckdb_and_single_turn(ray_session):
    """Gaps follow turn_idx order even when input rows are shuffled
    (c4's rows arrive reversed → gap 1s, never negative); single-turn
    conversations report 0/0."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.convstats import turn_gap_stats, turn_gap_stats_sql

    tbl = _conv_table()
    got = (
        turn_gap_stats(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", tbl)
    orc = con.execute(turn_gap_stats_sql("corpus")).fetchdf()
    assert got[orc.columns].equals(orc)
    by = got.set_index("conv_id")
    assert by.loc["c2", "n_turns"] == 1
    assert by.loc["c2", "total_gap_us"] == 0 == by.loc["c2", "max_gap_us"]
    assert by.loc["c4", "total_gap_us"] == 1_000_000
    assert by.loc["c1", "total_gap_us"] == 1_000_000
    assert by.loc["c3", "total_gap_us"] == 3_000_000


def _conv_table2():
    """Transcript corpus exercising SFT-pair adjacency (assistant
    after user vs after tool), role transitions, and assistant-share
    edge cases (all-assistant conv, zero-token conv)."""
    rows = [
        ("c1", 0, "user", "alpha one", "", 1),
        ("c1", 1, "assistant", "beta gamma delta", "", 2),
        ("c1", 2, "user", "next q", "", 3),
        ("c1", 3, "tool", "tool out", "grep", 4),
        ("c1", 4, "assistant", "after tool", "", 5),
        ("c2", 0, "user", "solo", "", 6),
        ("c3", 0, "assistant", "only assistant words here", "", 7),
        ("c4", 0, "user", "", "", 8),
    ]
    import pyarrow as pa

    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array(
                [r[5] * 1_000_000 for r in rows], pa.timestamp("us")
            ),
        }
    )


def test_sft_pairs_matches_duckdb_and_adjacency(ray_session):
    """Only user→assistant adjacencies emit pairs: c1 turn 1 pairs
    with turn 0; c1 turn 4 (assistant after tool) does not; c3's
    conversation-opening assistant turn has no prompt."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.convstats import sft_pairs, sft_pairs_sql

    tbl = _conv_table2()
    got = (
        sft_pairs(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", tbl)
    orc = con.execute(sft_pairs_sql("corpus")).fetchdf()
    assert got[orc.columns].astype(str).equals(orc.astype(str))
    assert len(got) == 1
    assert got.loc[0, "prompt"] == "alpha one"
    assert got.loc[0, "response"] == "beta gamma delta"


def test_role_transitions_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.convstats import (
        role_transitions,
        role_transitions_sql,
    )

    tbl = _conv_table2()
    got = (
        role_transitions(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", tbl)
    orc = con.execute(role_transitions_sql("corpus")).fetchdf()
    assert got[orc.columns].equals(orc)
    by = got.set_index(["prev_role", "role"])["n"]
    assert by[("user", "assistant")] == 1
    assert by[("tool", "assistant")] == 1
    assert by[("assistant", "user")] == 1
    assert by[("user", "tool")] == 1
    # single-turn conversations contribute no transitions
    assert int(got["n"].sum()) == 4


def test_assistant_share_matches_duckdb_and_keep_band(ray_session):
    """share_bp is exact integer floor basis points; keep band
    [1000, 9000]: c1 in-band, c2 (0 assistant tokens) drops low, c3
    (10000 bp monologue) drops high, c4 (zero tokens) drops."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.convstats import (
        assistant_share,
        assistant_share_sql,
    )

    tbl = _conv_table2()
    got = (
        assistant_share(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", tbl)
    orc = con.execute(assistant_share_sql("corpus")).fetchdf()
    assert got[orc.columns].astype(str).equals(orc.astype(str))
    by = got.set_index("conv_id")
    # c1: assistant 5 of 11 tokens -> floor(50000/11) = 4545 bp, keep
    assert by.loc["c1", "share_bp"] == 4545 and bool(by.loc["c1", "keep"])
    assert by.loc["c2", "share_bp"] == 0 and not bool(by.loc["c2", "keep"])
    assert by.loc["c3", "share_bp"] == 10000 and not bool(by.loc["c3", "keep"])
    assert by.loc["c4", "total_tokens"] == 0 and not bool(by.loc["c4", "keep"])


def _conv_table3():
    """Corpus with a 3-turn tool run (stuck-loop shape) and a long
    conversation for truncation."""
    rows = [
        ("c1", 0, "user", "a"),
        ("c1", 1, "tool", "t1"),
        ("c1", 2, "tool", "t2"),
        ("c1", 3, "tool", "t3"),
        ("c1", 4, "assistant", "ans"),
        ("c1", 5, "user", "b"),
        ("c1", 6, "tool", "t4"),
        ("c2", 0, "user", "solo"),
    ]
    import pyarrow as pa

    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def test_role_run_stats_matches_duckdb_islands(ray_session):
    """c1's tool turns form runs of 3 and 1 (max_run 3, n_runs 2)
    even with shuffled partitioning; user appears in 2 runs of 1."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.convstats import role_run_stats, role_run_stats_sql

    tbl = _conv_table3()
    got = (
        role_run_stats(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", tbl)
    orc = con.execute(role_run_stats_sql("corpus")).fetchdf()
    assert got[orc.columns].astype(str).equals(orc.astype(str))
    by = got.set_index(["conv_id", "role"])
    assert by.loc[("c1", "tool"), "max_run"] == 3
    assert by.loc[("c1", "tool"), "n_runs"] == 2
    assert by.loc[("c1", "user"), "max_run"] == 1
    assert by.loc[("c1", "user"), "n_runs"] == 2
    assert by.loc[("c2", "user"), "n_runs"] == 1


def test_conv_truncate_matches_duckdb_and_keeps_tail(ray_session):
    """k=3 keeps c1's LAST three turns (idx 4, 5, 6) and all of c2."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.convstats import conv_truncate, conv_truncate_sql

    tbl = _conv_table3()
    got = (
        conv_truncate(rd.from_arrow(tbl).repartition(3), k=3)
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", tbl)
    orc = con.execute(conv_truncate_sql("corpus", 3)).fetchdf()
    assert got[orc.columns].astype(str).equals(orc.astype(str))
    assert list(got[got["conv_id"] == "c1"]["turn_idx"]) == [4, 5, 6]
    assert list(got[got["conv_id"] == "c2"]["turn_idx"]) == [0]


def test_boilerplate_turns_matches_duckdb_and_tiebreak(ray_session):
    """'hello' repeats 3x across 2 convs; 'bye' and 'aa' both repeat
    2x (tie broken by text asc); singletons drop (min_count=2)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.convstats import (
        boilerplate_turns,
        boilerplate_turns_sql,
    )

    texts = ["hello", "hello", "bye", "unique1", "bye", "hello", "aa", "aa"]
    convs = ["c1", "c1", "c1", "c2", "c2", "c2", "c3", "c3"]
    tbl = pa.table(
        {
            "conv_id": pa.array(convs, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        boilerplate_turns(rd.from_arrow(tbl).repartition(3), k=2, min_count=2)
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", tbl)
    orc = con.execute(boilerplate_turns_sql("corpus", 2, 2)).fetchdf()
    assert got[orc.columns].equals(orc)
    assert list(got["text"]) == ["hello", "aa"]
    assert list(got["n_turns"]) == [3, 2]
    assert list(got["n_convs"]) == [2, 1]


def test_turn_rate_matches_duckdb_hour_buckets(ray_session):
    """Turns at 00:10, 00:50, 01:05 land in two hour buckets; a conv
    spanning both hours counts as active in each."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.convstats import turn_rate, turn_rate_sql

    h = 3_600_000_000
    tbl = pa.table(
        {
            "conv_id": pa.array(["c1", "c2", "c1"], pa.string()),
            "ts": pa.array([600_000_000, 3_000_000_000, h + 300_000_000],
                           pa.timestamp("us")),
        }
    )
    got = (
        turn_rate(rd.from_arrow(tbl).repartition(2))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", tbl)
    orc = con.execute(turn_rate_sql("corpus")).fetchdf()
    assert got[orc.columns].astype(str).equals(orc.astype(str))
    assert list(got["n_turns"]) == [2, 1]
    assert list(got["n_convs"]) == [2, 1]


def test_tool_latency_matches_duckdb_and_untimed_final_turn(ray_session):
    """Latency = gap to the NEXT turn in turn_idx order; a tool turn
    that ends its conversation is untimed (no successor)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.convstats import tool_latency, tool_latency_sql

    rows = [
        ("c1", 0, "user", "", 0),
        ("c1", 1, "tool", "grep", 1_000_000),
        ("c1", 2, "tool", "ls", 4_000_000),
        ("c1", 3, "assistant", "", 9_000_000),
        ("c2", 0, "user", "", 5_000_000),
        ("c2", 1, "tool", "grep", 7_000_000),  # final turn: untimed
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([r[3] for r in rows], pa.string()),
            "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
        }
    )
    got = (
        tool_latency(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", tbl)
    orc = con.execute(tool_latency_sql("corpus")).fetchdf()
    assert got[orc.columns].astype(str).equals(orc.astype(str))
    by = got.set_index("tool")
    assert by.loc["grep", "n_timed"] == 1      # c2's final tool turn untimed
    assert by.loc["grep", "total_us"] == 3_000_000
    assert by.loc["ls", "total_us"] == 5_000_000


def test_conv_similarity_pairs_matches_duckdb(ray_session):
    """Whole-conversation unigram Jaccard: conv 0 and conv 1 share
    2 of 4 distinct tokens (j=0.5); conv 2 is disjoint.  Turn order
    and partitioning must not change the concatenated sets."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.convstats import (
        conv_similarity_pairs,
        conv_similarity_pairs_sql,
    )

    rows = [
        ("conv-00000000", 1, "bb cc"),
        ("conv-00000000", 0, "aa bb"),
        ("conv-00000001", 0, "bb cc dd"),
        ("conv-00000002", 0, "xx yy zz"),
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    got = (
        conv_similarity_pairs(
            rd.from_arrow(tbl).repartition(3), threshold=0.4, shingle=1
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", tbl)
    orc = con.execute(conv_similarity_pairs_sql("corpus", 0.4)).fetchdf()
    assert got[orc.columns].astype(str).equals(orc.astype(str))
    assert len(got) == 1
    assert got.loc[0, "conv_a"] == "conv-00000000"
    assert got.loc[0, "conv_b"] == "conv-00000001"
    assert float(got.loc[0, "jaccard"]) == 0.5


def test_conv_curation_composed_flagship(ray_session):
    """End-to-end: the monologue conv drops (share band), the
    duplicate conv drops (dedup, min-id canonical), the long conv's
    early pairs fall outside the k=4 truncation window; the output
    matches the chained DuckDB twin exactly."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from raysearch.pipelines.convstats import conv_curation, conv_curation_sql

    rows = [
        ("conv-00000001", 0, "user", "alpha beta"),
        ("conv-00000001", 1, "assistant", "gamma delta"),
        ("conv-00000001", 2, "user", "eps zeta"),
        ("conv-00000001", 3, "assistant", "eta theta"),
        # exact content duplicate of conv 1 -> dropped (dedup)
        ("conv-00000003", 0, "user", "alpha beta"),
        ("conv-00000003", 1, "assistant", "gamma delta"),
        ("conv-00000003", 2, "user", "eps zeta"),
        ("conv-00000003", 3, "assistant", "eta theta"),
        # all-assistant monologue -> dropped (share band)
        ("conv-00000002", 0, "assistant", "mono logue only"),
    ] + [
        ("conv-00000004", i, role, f"t{i} words here")
        for i, role in enumerate(
            ["user", "assistant", "user", "assistant", "user", "assistant"]
        )
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    got = (
        conv_curation(rd.from_arrow(tbl).repartition(3), k=4)
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", tbl)
    orc = con.execute(conv_curation_sql("corpus", k=4)).fetchdf()
    assert got[orc.columns].astype(str).equals(orc.astype(str))
    assert set(got["conv_id"]) == {"conv-00000001", "conv-00000004"}
    # conv 4's k=4 window starts at turn 2: pairs at idx 3 and 5 only
    assert list(got[got["conv_id"] == "conv-00000004"]["turn_idx"]) == [3, 5]
