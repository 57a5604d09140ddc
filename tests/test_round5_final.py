"""Round-5 final-block operators: keyterms_topk (per-doc distinctive
terms), lang_bigrams (per-language phrase statistics) and
phrase_search (exact token-adjacency phrase query) — each checked
against its DuckDB twin, across partitionings, on edge cases, and
(keyterms) across both join strategies."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _doc_table(texts, langs=None):
    cols = {
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }
    if langs is not None:
        cols["lang"] = pa.array(langs)
    return pa.table(cols)


# ---------------------------------------------------------------------------
# keyterms_topk
# ---------------------------------------------------------------------------


def test_keyterms_matches_duckdb_and_ties(ray_session):
    """(tf DESC, df ASC, term) ranking equals the SQL window across
    partitionings; tf ties resolve to the rarer (lower-df) term and
    df ties to the lexicographically smaller term; empty docs emit
    nothing; docs with < n distinct terms emit what they have."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.textstats import keyterms_sql, keyterms_topk

    texts = [
        "",                        # no rows
        "zz zz aa aa bb",          # tf tie zz/aa -> df decides, then term
        "aa",                      # 1 distinct term -> 1 row
        "cc cc cc zz aa bb dd",    # clear winner + 3-way tie tail
        "dd dd ee ee ff ff",       # full 3-way tf tie
    ]
    tbl = _doc_table(texts)
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(keyterms_sql(3)).fetchdf()
    for parts in (1, 4):
        got = (
            keyterms_topk(rd.from_arrow(tbl).repartition(parts), n=3)
            .to_pandas()
            .reset_index(drop=True)
        )
        assert got[orc.columns].equals(orc), parts
    assert not (orc["doc_id"] == 0).any()
    assert list(orc[orc["doc_id"] == 2]["term"]) == ["aa"]
    # doc 3: cc (tf 3) first, then the tf-1 four-way tie by (df, term)
    assert list(orc[orc["doc_id"] == 3]["term"])[0] == "cc"


def test_keyterms_copartition_path_identical(ray_session):
    """Forcing the vocabulary over the broadcast limit switches to the
    copartition-join + map_groups path; rows must be identical."""
    import ray.data as rd

    import raysearch.pipelines.textstats as ts

    texts = ["aa bb cc", "bb cc dd", "cc dd ee", ""]
    tbl = _doc_table(texts)
    ds = rd.from_arrow(tbl).repartition(2)
    fast = ts.keyterms_topk(ds, n=2).to_pandas().reset_index(drop=True)
    old = ts.KEYTERMS_BROADCAST_LIMIT
    ts.KEYTERMS_BROADCAST_LIMIT = 1
    try:
        slow = ts.keyterms_topk(ds, n=2).to_pandas().reset_index(drop=True)
    finally:
        ts.KEYTERMS_BROADCAST_LIMIT = old
    assert fast.equals(slow)


def test_keyterms_real_corpus(ray_session):
    """The sf0.001 corpus through the distributed plan: every doc with
    text emits exactly min(3, distinct terms) rows, ranks are 1..k,
    df values equal the independent term_df aggregate."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.textstats import keyterms_sql, keyterms_topk

    p = "/root/testdata/sf0.001/documents.parquet"
    got = (
        keyterms_topk(
            rd.read_parquet(p, columns=["doc_id", "text"]), n=3
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')"
    )
    orc = con.execute(keyterms_sql(3)).fetchdf()
    assert got[orc.columns].equals(orc)
    assert (got.groupby("doc_id")["rk"].agg(list).map(
        lambda r: r == list(range(1, len(r) + 1))
    )).all()


# ---------------------------------------------------------------------------
# lang_bigrams
# ---------------------------------------------------------------------------


def test_lang_bigrams_matches_duckdb(ray_session):
    """Per-lang counts and (n DESC, w1, w2) ranks equal the SQL window
    across partitionings; langs never bleed into each other; a lang
    with fewer than k distinct bigrams emits them all."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.textstats import lang_bigrams, lang_bigrams_sql

    texts = [
        "a b a b c",     # en: (a,b)x2 (b,a) (b,c)
        "a b d",         # en
        "x y x y x y",   # de: (x,y)x3 (y,x)x2
        "",              # de: nothing
        "a b",           # fr: single bigram
    ]
    langs = ["en", "en", "de", "de", "fr"]
    tbl = _doc_table(texts, langs)
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(lang_bigrams_sql(3)).fetchdf()
    for parts in (1, 3):
        got = (
            lang_bigrams(rd.from_arrow(tbl).repartition(parts), k=3)
            .to_pandas()
            .reset_index(drop=True)
        )
        assert got[orc.columns].equals(orc), parts
    en = orc[orc["lang"] == "en"]
    assert list(en[["w1", "w2"]].itertuples(index=False, name=None))[0] == (
        "a", "b",
    )
    assert list(orc[orc["lang"] == "fr"]["n"]) == [1]
    assert set(orc["lang"]) == {"en", "de", "fr"}


def test_lang_bigrams_real_corpus(ray_session):
    """sf0.001 corpus: distributed result equals the DuckDB window over
    the same parquet."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.textstats import lang_bigrams, lang_bigrams_sql

    p = "/root/testdata/sf0.001/documents.parquet"
    got = (
        lang_bigrams(rd.read_parquet(p, columns=["lang", "text"]), k=10)
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')"
    )
    orc = con.execute(lang_bigrams_sql(10)).fetchdf()
    assert got[orc.columns].equals(orc)


# ---------------------------------------------------------------------------
# phrase_search
# ---------------------------------------------------------------------------


def test_phrase_search_adjacency_and_counts(ray_session):
    """Only CONSECUTIVE same-doc token runs match: scattered terms
    (the conjunctive-AND relaxation) don't; overlapping occurrences
    each count; punctuation splits per the simple tokenizer; phrase
    words absent from a batch's vocabulary short-circuit."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.textstats import (
        phrase_search,
        phrase_search_sql,
    )

    texts = [
        "the quick fox",            # exact single hit
        "quick the fox the quick",  # words present, never adjacent
        "the quick fox the quick fox",   # two hits
        "THE, quick... FOX",        # case/punct normalize -> hit
        "the quick",                # prefix only
        "",                         # empty
        "a a a a",                  # self-overlap probe (phrase a a)
    ]
    tbl = _doc_table(texts)
    phrase = ("the", "quick", "fox")
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(phrase_search_sql(phrase)).fetchdf()
    for parts in (1, 4):
        got = (
            phrase_search(rd.from_arrow(tbl).repartition(parts), phrase)
            .to_pandas()
            .reset_index(drop=True)
        )
        assert got[orc.columns].equals(orc), parts
    assert dict(zip(orc["doc_id"], orc["n_hits"])) == {0: 1, 2: 2, 3: 1}
    # overlapping occurrences: "a a a a" has three "a a" bigram hits
    got2 = (
        phrase_search(rd.from_arrow(tbl), ("a", "a"))
        .to_pandas()
    )
    orc2 = con.execute(phrase_search_sql(("a", "a"))).fetchdf()
    assert got2[orc2.columns].equals(orc2)
    assert dict(zip(got2["doc_id"], got2["n_hits"]))[6] == 3


def test_phrase_search_single_word_and_missing(ray_session):
    """L=1 degenerates to per-doc tf of the word; a phrase containing
    an out-of-corpus word matches nothing."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.textstats import (
        phrase_search,
        phrase_search_sql,
    )

    tbl = _doc_table(["b a b b", "a", "c"])
    con = duckdb.connect()
    con.register("documents", tbl)
    got = phrase_search(rd.from_arrow(tbl), ("b",)).to_pandas()
    orc = con.execute(phrase_search_sql(("b",))).fetchdf()
    assert got[orc.columns].equals(orc)
    assert dict(zip(got["doc_id"], got["n_hits"])) == {0: 3}
    missing = phrase_search(
        rd.from_arrow(tbl), ("b", "zzz")
    ).to_pandas()
    assert len(missing) == 0


# ---------------------------------------------------------------------------
# dup_span_stats
# ---------------------------------------------------------------------------


def test_dup_span_stats_matches_duckdb(ray_session):
    """Shared-fingerprint counts equal the SQL twin across
    partitionings; a substring shared by two docs (length >= k+w-1,
    the winnowing guarantee) yields n_shared >= 1 in BOTH; a doc with
    unique text has n_shared = 0; a doc shorter than k emits nothing;
    self-repeats within ONE doc don't count as shared."""
    import duckdb
    import ray.data as rd

    from __ray_entry__ import _dup_span_sql
    from raysearch.pipelines.textstats import dup_span_stats

    shared = "the identical duplicated span survives winnowing"
    texts = [
        f"left context {shared} right context",
        f"other prefix {shared} other suffix",
        "completely unique text with no twin anywhere here",
        "hi",                                   # < k chars: no fps
        "selfsame selfsame selfsame selfsame",  # repeats only itself
    ]
    tbl = _doc_table(texts)
    con = duckdb.connect()
    con.register("documents", tbl)
    orc = con.execute(_dup_span_sql()).fetchdf()
    for parts in (1, 3):
        got = (
            dup_span_stats(rd.from_arrow(tbl).repartition(parts))
            .to_pandas()
            .reset_index(drop=True)
        )
        assert got[orc.columns].equals(orc), parts
    by = dict(zip(orc["doc_id"], orc["n_shared"]))
    assert by[0] >= 1 and by[1] >= 1
    assert by[2] == 0 and by[4] == 0
    assert 3 not in by
    assert (orc["n_shared"] <= orc["n_fp"]).all()


def test_dup_span_stats_real_corpus(ray_session):
    """sf0.001 corpus: distributed result equals the DuckDB twin."""
    import duckdb
    import ray.data as rd

    from __ray_entry__ import _dup_span_sql
    from raysearch.pipelines.textstats import dup_span_stats

    p = "/root/testdata/sf0.001/documents.parquet"
    got = (
        dup_span_stats(rd.read_parquet(p, columns=["doc_id", "text"]))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')"
    )
    orc = con.execute(_dup_span_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    # token-soup corpora share plenty of >=11-char spans: non-degenerate
    assert (got["n_shared"] > 0).any()


# ---------------------------------------------------------------------------
# event_pairs / props_stats
# ---------------------------------------------------------------------------


def _event_table(rows):
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "props": pa.array([r[2] if len(r) > 2 else "{}" for r in rows]),
        }
    )


def test_event_pairs_matches_duckdb(ray_session):
    """Pair counts equal the distinct self-join across partitionings;
    repeat events don't double-count a user; a single-type user
    contributes no pairs; unordered pairs appear once (a < b)."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.relational import event_pairs, event_pairs_sql

    rows = [
        (1, "view"), (1, "click"), (1, "view"), (1, "view"),
        (2, "view"), (2, "click"), (2, "purchase"),
        (3, "view"),
        (4, "purchase"), (4, "click"),
    ]
    tbl = _event_table(rows)
    con = duckdb.connect()
    con.register("events", tbl)
    orc = con.execute(event_pairs_sql()).fetchdf()
    for parts in (1, 3):
        got = (
            event_pairs(rd.from_arrow(tbl).repartition(parts))
            .to_pandas()
            .reset_index(drop=True)
        )
        assert got[orc.columns].equals(orc), parts
    by = {(a, b): n for a, b, n in orc.itertuples(index=False)}
    assert by[("click", "view")] == 2        # users 1, 2
    assert by[("click", "purchase")] == 2    # users 2, 4
    assert ("view", "click") not in by       # ordered once


def test_event_pairs_real_corpus(ray_session):
    """sf0.001 events through the distributed bitmask plan."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.relational import event_pairs, event_pairs_sql

    p = "/root/testdata/sf0.001/events.parquet"
    got = (
        event_pairs(
            rd.read_parquet(p, columns=["user_id", "event_type"])
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    orc = con.execute(event_pairs_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    assert len(got) > 0


def test_props_stats_matches_duckdb(ray_session):
    """Extraction + per-type aggregates equal the SQL twin; rows
    without an extractable k are excluded from n entirely."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.relational import props_stats, props_stats_sql

    rows = [
        (1, "view", '{"k": 5}'),
        (2, "view", '{"k": 11}'),
        (3, "view", '{"nope": 1}'),       # no k -> excluded
        (4, "click", '{"k": 0}'),
        (5, "click", '{"k":  7}'),        # whitespace tolerated
        (6, "error", "not json at all"),  # excluded
    ]
    tbl = _event_table(rows)
    con = duckdb.connect()
    con.register("events", tbl)
    orc = con.execute(props_stats_sql()).fetchdf()
    for parts in (1, 3):
        got = (
            props_stats(rd.from_arrow(tbl).repartition(parts))
            .to_pandas()
            .reset_index(drop=True)
        )
        assert got[orc.columns].equals(orc), parts
    view = orc[orc["event_type"] == "view"].iloc[0]
    assert (view["n"], view["sum_k"], view["min_k"], view["max_k"]) == (
        2, 16, 5, 11,
    )
    assert "error" not in set(orc["event_type"])


def test_props_stats_real_corpus(ray_session):
    """sf0.001 events: distributed result equals the DuckDB twin."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.relational import props_stats, props_stats_sql

    p = "/root/testdata/sf0.001/events.parquet"
    got = (
        props_stats(rd.read_parquet(p, columns=["event_type", "props"]))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
    orc = con.execute(props_stats_sql()).fetchdf()
    assert got[orc.columns].equals(orc)


# ---------------------------------------------------------------------------
# ann_range / ann_filtered_topk / embed_quantize
# ---------------------------------------------------------------------------


def test_cosine_range_matches_duckdb(ray_session):
    """Range matches equal the SQL twin at sf0.001 across the real
    distributed plan; every returned score >= threshold; the top-1
    hit of each query (itself, cosine 1.0) is present."""
    import duckdb
    import ray.data as rd

    from __ray_entry__ import ANN_QUERY_IDS, ANN_RANGE_THRESHOLD, _query_matrix
    from raysearch.pipelines.simsearch import cosine_range

    sf = "/root/testdata/sf0.001"
    p = f"{sf}/embeddings.parquet"
    got = (
        cosine_range(
            rd.read_parquet(p, columns=["vec_id", "embedding"]),
            _query_matrix(sf),
            list(ANN_QUERY_IDS),
            ANN_RANGE_THRESHOLD,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}')")
    q = ", ".join(str(i) for i in ANN_QUERY_IDS)
    orc = con.execute(
        "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
        f"WHERE vec_id IN ({q})) "
        "SELECT q.query_id, e.vec_id, "
        "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
        "CAST(q.qe AS DOUBLE[])), 4) AS score "
        "FROM embeddings e CROSS JOIN q "
        "WHERE round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
        f"CAST(q.qe AS DOUBLE[])), 4) >= {ANN_RANGE_THRESHOLD} "
        "ORDER BY q.query_id, e.vec_id"
    ).fetchdf()
    assert got[orc.columns].equals(orc)
    assert (got["score"] >= ANN_RANGE_THRESHOLD).all()
    for qid in ANN_QUERY_IDS:
        sub = got[got["query_id"] == qid]
        assert qid in set(sub["vec_id"])  # self-match at cosine 1.0


def test_embed_quantize_matches_duckdb_and_edges(ray_session):
    """Codes equal the SQL twin on a hand-built table with a constant
    dim (codes 0), the min (code 0) and max (code 255) of each dim,
    across partitionings; and on the real sf0.001 table."""
    import duckdb
    import ray.data as rd

    from __ray_entry__ import oracle_sql
    from raysearch.pipelines.simsearch import embed_quantize

    sql = oracle_sql()["embed_quantize"]
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [[0.0, 5.0, -1.0], [1.0, 5.0, 3.0], [0.5, 5.0, 1.0]],
                pa.list_(pa.float32()),
            ),
        }
    )
    con = duckdb.connect()
    con.register("embeddings", tbl)
    orc = con.execute(sql).fetchdf()
    for parts in (1, 3):
        got = (
            embed_quantize(rd.from_arrow(tbl).repartition(parts))
            .to_pandas()
            .reset_index(drop=True)
        )
        assert got[orc.columns].equals(orc), parts
    by = {(v, d): c for v, d, c in orc.itertuples(index=False)}
    assert by[(0, 0)] == 0 and by[(1, 0)] == 255   # min/max of dim 0
    assert by[(0, 1)] == by[(1, 1)] == by[(2, 1)] == 0  # constant dim
    assert by[(0, 2)] == 0 and by[(1, 2)] == 255
    assert by[(2, 2)] == 128  # 0.5 exactly -> round half away

    p = "/root/testdata/sf0.001/embeddings.parquet"
    got = (
        embed_quantize(
            rd.read_parquet(p, columns=["vec_id", "embedding"])
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}')"
    )
    orc = con2.execute(sql).fetchdf()
    assert got[orc.columns].equals(orc)
    assert got["code"].between(0, 255).all()


def test_ann_filtered_topk_matches_duckdb(ray_session):
    """Filtered exact ANN via read-pushdown equals the SQL twin; every
    returned vec has the filter label."""
    import duckdb

    from __ray_entry__ import (
        ANN_FILTER_LABEL,
        _q_ann_filtered,
        oracle_sql,
    )

    sf = "/root/testdata/sf0.001"
    got = _q_ann_filtered(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ("embeddings",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    orc = con.execute(oracle_sql()["ann_filtered_topk"]).fetchdf()
    assert got[orc.columns].equals(orc)
    labels = dict(
        zip(
            *map(
                list,
                con.execute(
                    "SELECT vec_id, label FROM embeddings"
                ).fetchnumpy().values(),
            )
        )
    )
    assert all(labels[v] == ANN_FILTER_LABEL for v in got["vec_id"])


# ---------------------------------------------------------------------------
# nation_revenue / order_priority_counts
# ---------------------------------------------------------------------------


def test_nation_revenue_matches_duckdb(ray_session):
    """4-table join chain equals the SQL twin on sf0.001; integer
    cents make the comparison exact regardless of partial-sum order;
    total is conserved across the join chain."""
    import duckdb
    import ray.data as rd

    from __ray_entry__ import _q_nation_revenue
    from raysearch.pipelines.relational import nation_revenue_sql

    sf = "/root/testdata/sf0.001"
    got = _q_nation_revenue(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    orc = con.execute(nation_revenue_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    # conservation: every lineitem's order/customer/nation exists in
    # the synthetic corpus, so nothing drops through the joins
    total = con.execute(
        "SELECT CAST(sum(CAST(round(round(l_extendedprice * "
        "(1 - l_discount), 2) * 100) AS BIGINT)) AS BIGINT) FROM lineitem"
    ).fetchone()[0]
    assert got["revenue_cents"].sum() == total


def test_order_priority_counts_matches_duckdb(ray_session):
    """EXISTS semi-join equals the SQL twin; totals bounded by order
    count; every priority value present in orders appears or is
    legitimately zero-matched."""
    import duckdb

    from __ray_entry__ import _q_order_priority
    from raysearch.pipelines.relational import order_priority_counts_sql

    sf = "/root/testdata/sf0.001"
    got = _q_order_priority(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    orc = con.execute(order_priority_counts_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    n_orders = con.execute("SELECT count(*) FROM orders").fetchone()[0]
    assert 0 < got["n_orders"].sum() <= n_orders


def test_order_priority_semijoin_edges(ray_session):
    """Hand-built case: an order with no lineitems, one with only
    early shipments, one with a late shipment, equal-date excluded
    (strict >)."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from raysearch.pipelines.relational import (
        order_priority_counts,
        order_priority_counts_sql,
    )

    d = lambda s: np.datetime64(s, "us")
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_orderdate": pa.array(
                [d("2020-01-10"), d("2020-01-10"), d("2020-01-10"),
                 d("2020-01-10")],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * 4),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_shipdate": pa.array(
                [d("2020-01-05"), d("2020-01-20"),  # order 1: late ship
                 d("2020-01-03"),                   # order 2: early only
                 d("2020-01-10")],                  # order 3: equal (excl)
                pa.timestamp("us"),
            ),
        }
    )
    got = (
        order_priority_counts(
            rd.from_arrow(orders).repartition(2),
            rd.from_arrow(lineitem).repartition(2),
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("orders", orders)
    con.register("lineitem", lineitem)
    orc = con.execute(order_priority_counts_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    assert got["n_orders"].tolist() == [1]  # only order 1


# ---------------------------------------------------------------------------
# lang_mismatch
# ---------------------------------------------------------------------------


def test_lang_mismatch_matches_duckdb(ray_session):
    """Disagreement audit equals the SQL twin at sf0.001; every output
    row really disagrees; output is a subset of the langid stream."""
    import duckdb
    import ray.data as rd

    from __ray_entry__ import _lang_mismatch_sql, _langid_sql
    from raysearch.pipelines.textstats import lang_mismatch

    p = "/root/testdata/sf0.001/documents.parquet"
    got = (
        lang_mismatch(
            rd.read_parquet(p, columns=["doc_id", "lang", "text"])
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')"
    )
    orc = con.execute(_lang_mismatch_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    assert (got["lang"] != got["lang_pred"]).all()
    pred = con.execute(_langid_sql()).fetchdf()
    assert set(got["doc_id"]) <= set(pred["doc_id"])


# ---------------------------------------------------------------------------
# supplier_volume / order_gaps
# ---------------------------------------------------------------------------


def test_supplier_volume_matches_duckdb(ray_session):
    """Fold + name attach equals the SQL twin; centi-quantities are
    integer-exact; line counts conserve."""
    import duckdb

    from __ray_entry__ import _q_supplier_volume
    from raysearch.pipelines.relational import supplier_volume_sql

    sf = "/root/testdata/sf0.001"
    got = _q_supplier_volume(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ("lineitem", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    orc = con.execute(supplier_volume_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    n_li = con.execute("SELECT count(*) FROM lineitem").fetchone()[0]
    assert got["n_lines"].sum() == n_li


def test_order_gaps_matches_duckdb_and_edges(ray_session):
    """LAG-window gaps equal the SQL twin on sf0.001 and on a
    hand-built table with a single-order customer (excluded), equal
    dates (gap 0, orderkey tie-break) and out-of-order input rows."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from __ray_entry__ import _q_order_gaps
    from raysearch.pipelines.relational import order_gaps, order_gaps_sql

    sf = "/root/testdata/sf0.001"
    got = _q_order_gaps(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf}/orders.parquet')"
    )
    orc = con.execute(order_gaps_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    assert (got["min_gap_us"] <= got["max_gap_us"]).all()
    assert (got["n_gaps"] >= 1).all()

    d = lambda s: np.datetime64(s, "us")
    tbl = pa.table(
        {
            "o_custkey": pa.array([7, 7, 7, 8, 9, 9], pa.int64()),
            "o_orderkey": pa.array([3, 1, 2, 4, 6, 5], pa.int64()),
            "o_orderdate": pa.array(
                [d("2020-01-05"), d("2020-01-01"), d("2020-01-05"),
                 d("2020-01-01"), d("2020-02-01"), d("2020-01-01")],
                pa.timestamp("us"),
            ),
        }
    )
    con2 = duckdb.connect()
    con2.register("orders", tbl)
    orc2 = con2.execute(order_gaps_sql()).fetchdf()
    got2 = (
        order_gaps(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .reset_index(drop=True)
    )
    assert got2[orc2.columns].equals(orc2)
    by = got2.set_index("o_custkey")
    assert 8 not in by.index                     # single order
    assert by.loc[7, "min_gap_us"] == 0          # equal dates
    assert by.loc[9, "n_gaps"] == 1


def test_unshipped_revenue_matches_duckdb(ray_session):
    """Q3-flavor date-filtered ladder equals the SQL twin on
    sf0.001; the date predicate acts as the join filter (every
    surviving order predates the cutoff); k bounds the output."""
    import duckdb

    from __ray_entry__ import _q_unshipped_revenue
    from raysearch.pipelines.relational import (
        UNSHIPPED_CUTOFF,
        unshipped_revenue_sql,
    )

    sf = "/root/testdata/sf0.001"
    got = _q_unshipped_revenue(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    orc = con.execute(unshipped_revenue_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    assert len(got) <= 10
    import numpy as np

    cut = np.datetime64(UNSHIPPED_CUTOFF, "us")
    assert (got["o_orderdate"].to_numpy() < cut).all()
    # revenue desc with orderkey tie-break is pinned
    rc = got["revenue_cents"].to_numpy()
    assert (rc[:-1] >= rc[1:]).all()


def test_returned_revenue_matches_duckdb(ray_session):
    """Q10-flavor returned-item ladder equals the SQL twin on
    sf0.001; names land on exactly the k winners."""
    import duckdb

    from __ray_entry__ import _q_returned_revenue
    from raysearch.pipelines.relational import returned_revenue_sql

    sf = "/root/testdata/sf0.001"
    got = _q_returned_revenue(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    orc = con.execute(returned_revenue_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    assert got["c_name"].notna().all()
    assert len(got) == len(orc) <= 20


def test_proximity_search_matches_duckdb_and_edges(ray_session):
    """NEAR/w window counts equal the SQL twin on sf0.001; a
    hand-built batch pins boundary behavior (windows never straddle
    docs, docs shorter than w emit nothing — on BOTH engines —
    and an absent term empties the batch)."""
    import duckdb
    import ray.data as rd

    from __ray_entry__ import PROXIMITY_W, QUERY_TERMS, _q_proximity_search
    from raysearch.pipelines.textstats import (
        proximity_search,
        proximity_search_sql,
    )

    sf = "/root/testdata/sf0.001"
    got = _q_proximity_search(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    orc = con.execute(
        proximity_search_sql(QUERY_TERMS, PROXIMITY_W)
    ).fetchdf()
    assert got[orc.columns].equals(orc)
    assert len(got) > 0
    # hand-built edges: exact window arithmetic and doc isolation
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "a b c"},          # all 3 in w=3 -> 1
            {"doc_id": 2, "text": "a b x c"},        # needs w>=4
            {"doc_id": 3, "text": "a b"},            # shorter than w
            {"doc_id": 4, "text": "c x x x a b"},    # far apart
        ]
    )
    out = (
        proximity_search(docs, ("a", "b", "c"), 3)
        .to_pandas()
        .set_index("doc_id")["n_windows"]
        .to_dict()
    )
    assert out == {1: 1}
    # w=4: doc 1 (3 tokens) is SHORTER than the window -> no window
    # fits inside it, so it drops out; doc 2 gains its single window
    out4 = (
        proximity_search(docs, ("a", "b", "c"), 4)
        .to_pandas()
        .set_index("doc_id")["n_windows"]
        .to_dict()
    )
    assert out4 == {2: 1}
    # absent term: nothing matches anywhere
    assert (
        proximity_search(docs, ("a", "zzz"), 4).to_pandas().empty
    )


def test_heavy_hitters_matches_duckdb_and_edges(ray_session):
    """Exact heavy hitters equal the SQL twin on sf0.001; a skewed
    hand-built corpus split across many blocks pins the candidate
    union argument (hitter concentrated in one block still found,
    near-threshold non-hitter rejected by verification); a tiny k on
    the near-uniform corpus yields the empty set with the declared
    schema."""
    import duckdb
    import ray.data as rd

    from __ray_entry__ import _q_heavy_hitters
    from raysearch.pipelines.sketch import heavy_hitters, heavy_hitters_sql

    sf = "/root/testdata/sf0.001"
    got = _q_heavy_hitters(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    orc = con.execute(heavy_hitters_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    assert len(got) > 0
    # strict > threshold: every reported n clears total/k
    total = con.execute(
        "SELECT count(*) FROM (SELECT unnest(regexp_split_to_array("
        "lower(text), '[^a-z0-9]+')) AS t FROM documents) WHERE t <> ''"
    ).fetchone()[0]
    assert (got["n"].to_numpy() * 30 > total).all()
    # near-uniform corpus at k=2: nothing exceeds half the stream
    # (the empty path returns a typed DataFrame — an empty Dataset
    # would lose its schema through to_pandas)
    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    empty = heavy_hitters(ds, k=2)
    assert list(empty.columns) == ["term", "n"] and len(empty) == 0
    # skew: 'hot' is >1/3 of the stream but all its mass sits in the
    # first rows; across 8 blocks the block-local pigeonhole still
    # nominates it somewhere and verification gets the exact count.
    rows = [{"text": "hot hot hot"}] * 40 + [
        {"text": f"w{i} w{i} filler"} for i in range(40)
    ]
    skew = rd.from_items(rows, override_num_blocks=8)
    out = heavy_hitters(skew, k=3).to_pandas().set_index("term")["n"]
    assert out.to_dict() == {"hot": 120}


def test_tool_ngrams_matches_duckdb_and_edges(ray_session):
    """Tool-call bigrams equal the LAG twin over the generated
    transcripts; intervening non-tool turns are ignored; a
    conversation with < 2 tool calls emits nothing."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from __ray_entry__ import _conv_corpus, _corpus_and_index
    from raysearch.pipelines.convstats import tool_ngrams, tool_ngrams_sql

    sf = "/root/testdata/sf0.001"
    corpus, _ = _corpus_and_index(sf)
    got = (
        tool_ngrams(_conv_corpus(sf, ["conv_id", "turn_idx", "role", "tool"]))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW conv AS SELECT * FROM read_parquet('{corpus}/*.parquet')"
    )
    orc = con.execute(tool_ngrams_sql("conv")).fetchdf()
    assert got[orc.columns].equals(orc)
    assert len(got) > 0
    assert int(got["n"].sum()) == con.execute(
        "SELECT count(*) - count(DISTINCT conv_id) FROM conv "
        "WHERE role = 'tool' AND tool <> ''"
    ).fetchone()[0]
    # hand-built: user turns between tool calls don't break the chain
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "tool", "tool": "grep"},
        {"conv_id": "c1", "turn_idx": 1, "role": "user", "tool": ""},
        {"conv_id": "c1", "turn_idx": 2, "role": "tool", "tool": "edit"},
        {"conv_id": "c2", "turn_idx": 0, "role": "tool", "tool": "grep"},
        {"conv_id": "c3", "turn_idx": 0, "role": "user", "tool": ""},
    ]
    out = (
        tool_ngrams(rd.from_items(rows, override_num_blocks=2))
        .to_pandas()
        .reset_index(drop=True)
    )
    assert out.to_dict("records") == [
        {"prev_tool": "grep", "tool": "edit", "n": 1}
    ]


def test_active_users_matches_duckdb_and_window(ray_session):
    """Trailing-7-day distinct users equal the SQL twin on sf0.001;
    a hand-built stream pins the window arithmetic (activity on day
    d keeps buckets d..d+6 alive; repeat events and multi-day users
    count once per bucket)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from __ray_entry__ import _q_active_users
    from raysearch.pipelines.relational import active_users, active_users_sql

    sf = "/root/testdata/sf0.001"
    got = _q_active_users(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    orc = con.execute(active_users_sql()).fetchdf()
    assert got[orc.columns].equals(orc)
    assert len(got) > 0
    # hand-built: u1 twice on day 0 (dedup), u2 on day 3; 7-day
    # trailing windows overlap on days 3..6 where both are active
    def d(day, h=5):
        return np.datetime64("2024-01-01", "us") + np.timedelta64(
            day * 24 + h, "h"
        )

    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 2],
            "ts": [d(0), d(0, 9), d(3)],
        }
    )
    out = (
        active_users(rd.from_pandas(ev))
        .to_pandas()
        .set_index("bucket")["n_users"]
    )
    day0 = pd.Timestamp("2024-01-01")
    for off in range(10):
        expect = (1 if off <= 6 else 0) + (1 if 3 <= off <= 9 else 0)
        assert out.get(day0 + pd.Timedelta(days=off), 0) == expect


def test_trending_terms_matches_duckdb_and_ties(ray_session):
    """Per-day top-k equals the SQL window on the generated
    transcripts; a hand-built two-day stream pins tie-breaks
    (n DESC, term ASC) and day isolation."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from __ray_entry__ import _conv_corpus, _corpus_and_index
    from raysearch.pipelines.convstats import (
        trending_terms,
        trending_terms_sql,
    )

    sf = "/root/testdata/sf0.001"
    corpus, _ = _corpus_and_index(sf)
    got = (
        trending_terms(_conv_corpus(sf, ["text", "ts"]))
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW conv AS SELECT * FROM read_parquet('{corpus}/*.parquet')"
    )
    orc = con.execute(trending_terms_sql("conv")).fetchdf()
    assert got[orc.columns].equals(orc)
    assert (got.groupby("day")["rk"].max() <= 10).all()
    # hand-built: day 1 has a 3-way count tie broken by term; day 2's
    # vocabulary never leaks into day 1
    t0 = np.datetime64("2024-03-01T10:00", "us")
    day = np.timedelta64(24 * 3600 * 1_000_000, "us")
    ev = pd.DataFrame(
        {
            "text": ["b b a a c c", "zz zz zz yy"],
            "ts": [t0, t0 + day],
        }
    )
    out = trending_terms(rd.from_pandas(ev), k=2).to_pandas()
    d1 = out[out["day"] == pd.Timestamp("2024-03-01")]
    assert list(d1["term"]) == ["a", "b"] and list(d1["n"]) == [2, 2]
    d2 = out[out["day"] == pd.Timestamp("2024-03-02")]
    assert list(d2["term"]) == ["zz", "yy"] and list(d2["n"]) == [3, 1]


def test_index_lineage_rows_match_manifests(ray_session):
    """The lineage queryable mirrors the wave manifests exactly and
    its per-partition totals agree with the corpus-wide stats (token
    and doc sums equal the doclens-derived totals)."""
    import duckdb

    from __ray_entry__ import _corpus_and_index, _q_index_lineage

    sf = "/root/testdata/sf0.001"
    df = _q_index_lineage(sf)
    corpus, index = _corpus_and_index(sf)
    assert len(df) >= 1
    assert df["partition_id"].is_unique or df["wave"].nunique() > 1
    con = duckdb.connect()
    n_turns = con.execute(
        f"SELECT count(*) FROM read_parquet('{corpus}/*.parquet')"
    ).fetchone()[0]
    assert int(df["n_docs"].sum()) == n_turns
    import json

    with open(f"{index}/merged/meta.json") as f:
        meta = json.load(f)
    assert int(df["n_docs"].sum()) == meta["n_docs"]
    assert int(df["n_tokens"].sum()) == meta["total_tokens"]
    assert (df["n_flushes"] >= 1).all() and (df["n_files"] >= 1).all()


def test_resumable_sink_write_resume_and_content(ray_session, tmp_path):
    """Fresh write: partitioned tree content equals the source and
    stats equal the SQL twin.  Crash simulation: deleting two
    markers (+ their dirs) re-runs ONLY those buckets — untouched
    bucket files keep their mtimes — and restores identical content.
    Full-marker re-run touches nothing and returns the same stats."""
    import duckdb
    import os
    import ray.data as rd

    from raysearch.pipelines.sink import resumable_sink_sql, write_resumable

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "sink")
    ds = rd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    stats = write_resumable(ds, out, key_col="doc_id", n_buckets=16)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    orc = con.execute(resumable_sink_sql(16)).fetchdf()
    assert stats[orc.columns].reset_index(drop=True).equals(orc)
    # content equality (ignoring order): the tree holds exactly the
    # source rows
    back = con.execute(
        f"SELECT doc_id, lang, n_chars FROM "
        f"read_parquet('{out}/bucket=*/part-0.parquet') ORDER BY doc_id"
    ).fetchdf()
    src = con.execute(
        "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id"
    ).fetchdf()
    assert back.equals(src)

    def mtimes():
        return {
            b: os.path.getmtime(os.path.join(out, b, "part-0.parquet"))
            for b in os.listdir(out)
            if os.path.exists(os.path.join(out, b, "part-0.parquet"))
        }

    before = mtimes()
    # full-marker re-run: nothing rewritten, same stats
    again = write_resumable(ds, out, key_col="doc_id", n_buckets=16)
    assert again.equals(stats)
    assert mtimes() == before
    # crash simulation: lose buckets 3 and 7 entirely
    import shutil

    for b in (3, 7):
        shutil.rmtree(os.path.join(out, f"bucket={b:05d}"))
    resumed = write_resumable(ds, out, key_col="doc_id", n_buckets=16)
    assert resumed.equals(stats)
    after = mtimes()
    for b, t in before.items():
        if b not in (f"bucket={3:05d}", f"bucket={7:05d}"):
            assert after[b] == t, b  # untouched buckets not rewritten
    back2 = con.execute(
        f"SELECT doc_id, lang, n_chars FROM "
        f"read_parquet('{out}/bucket=*/part-0.parquet') ORDER BY doc_id"
    ).fetchdf()
    assert back2.equals(src)


def test_tool_latency_quantiles_matches_duckdb(ray_session):
    """Grouped exact percentiles equal the quantile_disc twin; the
    p50 of each tool sits between its min and max timed duration and
    the refactored tool_latency still matches its own oracle."""
    import duckdb

    from __ray_entry__ import _corpus_and_index, _q_tool_latency_quantiles
    from raysearch.pipelines.convstats import tool_latency_quantiles_sql

    sf = "/root/testdata/sf0.001"
    corpus, _ = _corpus_and_index(sf)
    got = (
        _q_tool_latency_quantiles(sf).to_pandas().reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW conv AS SELECT * FROM read_parquet('{corpus}/*.parquet')"
    )
    orc = con.execute(tool_latency_quantiles_sql("conv")).fetchdf()
    assert got[orc.columns].equals(orc)
    assert set(got["q"]) == {0.5, 0.9, 0.99}
    piv = got.pivot(index="tool", columns="q", values="value")
    assert (piv[0.5] <= piv[0.9]).all() and (piv[0.9] <= piv[0.99]).all()


def test_fuzzy_terms_matches_duckdb_and_edges(ray_session):
    """Did-you-mean candidates equal the levenshtein() twin on
    sf0.001 for several misspellings; exact-hit queries report
    themselves at d=0; a nonsense query yields the typed empty
    result; the length prune can never drop a true candidate
    (|len(a)-len(b)| <= d is admissible)."""
    import duckdb
    import ray.data as rd

    from raysearch.pipelines.textstats import fuzzy_terms, fuzzy_terms_sql

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    for q, d in (("scann", 2), ("tabel", 2), ("join", 1), ("zzzz", 1)):
        got = (
            fuzzy_terms(ds, q, max_d=d).to_pandas().reset_index(drop=True)
        )
        orc = con.execute(fuzzy_terms_sql(q, max_d=d)).fetchdf()
        if len(orc) == 0:
            assert len(got) == 0, q
            continue
        assert got[orc.columns].equals(orc), q
    exact = fuzzy_terms(ds, "join", max_d=1).to_pandas()
    assert exact.iloc[0]["term"] == "join" and exact.iloc[0]["d"] == 0


def test_transcripts_bm25_or_gate_row(ray_session):
    """The OR-mode gate row equals its disjunctive SQL twin at
    sf0.001, is a superset-scoring relaxation of the conjunctive row
    (every AND hit appears among OR candidates with a >= score when
    extra terms match), and single-term queries coincide in both
    modes."""
    import duckdb

    from __ray_entry__ import (
        _fixture_topk_sql,
        _q_transcripts_bm25_or,
        oracle_sql,
    )

    sf = "/root/testdata/sf0.001"
    got = _q_transcripts_bm25_or(sf).reset_index(drop=True)
    # regenerate the sf0.001 corpus view for the twin (the oracle
    # builder pins /tmp/raysearch_entry/sf0.01 — query the builder
    # directly against this scale's corpus instead)
    from __ray_entry__ import _corpus_and_index

    corpus, _ = _corpus_and_index(sf)
    sql = _fixture_topk_sql("bm25", mode="or").replace(
        "/tmp/raysearch_entry/sf0.01/corpus", corpus
    )
    con = duckdb.connect()
    orc = con.execute(sql).fetchdf()
    assert len(got) == len(orc) > 0
    import pandas as pd

    g = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    o = orc.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (g["doc_id"].to_numpy() == o["doc_id"].to_numpy()).all()
    assert (abs(g["score"].to_numpy() - o["score"].to_numpy()) < 5e-5).all()


def test_gate_layout_invariants():
    """The driver checks the FIRST 50 entries of queries() (verified
    against CORRECTNESS_r04: its key list is exactly the round-4
    file's first 50 dict entries, in order).  Pin the layout so
    admissions can't silently slide rows out of the checked window
    again (the round-5 rebalance bug): exactly 50 entries sit above
    the below-cap marker, every one of the first 50 has an exact SQL
    oracle, and the oracle dict only references existing queries."""
    import re

    src = open("/root/repo/__ray_entry__.py").read()
    start = src.index("def queries")
    cap = src.index("below the driver")
    above = re.findall(r'"([a-z0-9_]+)": _q_', src[start:cap])
    assert len(above) == 50, (
        f"{len(above)} entries above the 50-row cap marker — "
        "demote/promote to restore exactly 50"
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    q = m.queries()
    o = m.oracle_sql()
    first50 = list(q)[:50]
    assert first50 == above, "dict order disagrees with the marker"
    missing = [k for k in first50 if k not in o]
    assert not missing, f"first-50 rows without an oracle: {missing}"
    dangling = [k for k in o if k not in q]
    assert not dangling, f"oracles without a query: {dangling}"
