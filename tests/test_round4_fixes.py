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
