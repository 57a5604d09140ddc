"""Deterministic synthetic transcript corpus generator (FIXTURES.md §1).

Produces the exact input shape from BASELINE.json's input_hint:
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])`` — one row per turn, rows unique by
``(conv_id, turn_idx)``, ``turn_idx`` contiguous from 0 per
conversation.  This replaces the reference's crawler output (``page``
rows, model/Page.java:12-29) as the corpus source.

Determinism contract: every file is generated purely from
``(seed, file_index)`` with numpy PCG64 — identical bytes at any
parallelism level, so golden fixtures and two-parallelism scaling runs
see the same corpus.  Word forms are sampled Zipf(s≈1.1) over the
shared vocab.py lemma ranks (guaranteed hot-term skew, exercising the
posting-skew path at every scale), and a fixed set of Russian golden
sentences (the reference's own test strings,
src/test/java/searchengine/services/LemmaSearchTests.java:16-24) is
embedded verbatim at known (conv_id, turn_idx) cells.

Files cover contiguous conv ranges, so per-file doc_id ranges are
contiguous under the global (conv_id, turn_idx) order.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.vocab import LEMMAS, LEMMA_FORMS

ZIPF_S = 1.1
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["bash", "search", "browser", "editor", "python", "sql", "fetch", "calc"]
BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in epoch micros

#: reference golden sentences embedded at fixed cells (conv_index, turn_idx)
GOLDEN_SENTENCES = [
    "появление леопарда в Осетии позволяет предположить, что леопард обитает",
    "повторное появление леопарда обитает в районам северного кавказа",
]

_flat_forms: list[str] = []
_form_offsets = np.zeros(len(LEMMAS) + 1, dtype=np.int64)
for _i, _lemma in enumerate(LEMMAS):
    _forms = LEMMA_FORMS[_lemma] or [_lemma]
    _flat_forms.extend(_forms)
    _form_offsets[_i + 1] = len(_flat_forms)
_FORM_ARR = np.array(_flat_forms, dtype=object)
_FORM_COUNTS = np.diff(_form_offsets)

_ranks = np.arange(1, len(LEMMAS) + 1, dtype=np.float64)
_ZIPF_P = (1.0 / _ranks**ZIPF_S)
_ZIPF_P /= _ZIPF_P.sum()
_ZIPF_CDF = np.cumsum(_ZIPF_P)


def conv_name(i: int) -> str:
    """Zero-padded so lexical sort == numeric sort (FIXTURES.md §1)."""
    return f"conv-{i:08d}"


def turns_for_conv(conv_idx: int, avg_turns: int) -> int:
    """Deterministic per-conversation turn count around ``avg_turns``."""
    span = max(1, avg_turns // 2)
    return max(2, avg_turns - span + (conv_idx * 2654435761 % (2 * span + 1)))


def _gen_file(
    conv_lo: int, conv_hi: int, seed: int, avg_turns: int, avg_tokens: int
) -> pa.Table:
    """Generate one Parquet fragment covering convs [conv_lo, conv_hi)."""
    rng = np.random.Generator(np.random.PCG64([seed, conv_lo]))
    n_turns_per_conv = np.array(
        [turns_for_conv(c, avg_turns) for c in range(conv_lo, conv_hi)], dtype=np.int64
    )
    total = int(n_turns_per_conv.sum())
    conv_idx = np.repeat(np.arange(conv_lo, conv_hi, dtype=np.int64), n_turns_per_conv)
    starts = np.cumsum(n_turns_per_conv) - n_turns_per_conv
    turn_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, n_turns_per_conv)

    # token counts per turn: 3 + Poisson(avg_tokens - 3)
    n_tokens = 3 + rng.poisson(max(1, avg_tokens - 3), size=total)
    flat_total = int(n_tokens.sum())
    # Zipf-ranked lemma draw then uniform form within lemma — vectorized
    u = rng.random(flat_total)
    lemma_ids = np.searchsorted(_ZIPF_CDF, u, side="right")
    form_pick = rng.integers(0, 1 << 30, size=flat_total)
    forms = _FORM_ARR[_form_offsets[lemma_ids] + form_pick % _FORM_COUNTS[lemma_ids]]
    tok_starts = np.cumsum(n_tokens) - n_tokens
    texts = [
        " ".join(forms[tok_starts[i] : tok_starts[i] + n_tokens[i]])
        for i in range(total)
    ]
    # embed golden sentences at fixed cells
    for g, sentence in enumerate(GOLDEN_SENTENCES):
        c, t = g * 7, 1
        if conv_lo <= c < conv_hi:
            pos = starts[c - conv_lo] + t
            if turn_idx[pos] == t:
                texts[pos] = sentence

    role_arr = np.array(ROLES, dtype=object)[turn_idx % len(ROLES)]
    tool_arr = np.where(
        role_arr == "tool",
        np.array(TOOLS, dtype=object)[(conv_idx + turn_idx) % len(TOOLS)],
        "",
    )
    ts = BASE_TS_US + conv_idx * 86_400_000_000 + turn_idx * 60_000_000
    return pa.table(
        {
            "conv_id": pa.array([conv_name(c) for c in conv_idx], pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role_arr, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tool_arr, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def write_corpus(
    out_dir: str,
    n_convs: int = 1000,
    avg_turns: int = 20,
    avg_tokens: int = 40,
    seed: int = 42,
    n_files: int | None = None,
    use_ray: bool = False,
) -> list[str]:
    """Write a deterministic multi-file Parquet corpus; returns file paths.

    Idempotent: skips generation when the directory already holds the
    expected file set (a ``_GEN_OK`` marker records the parameters).
    """
    if n_files is None:
        n_files = max(2, min(64, n_convs // 64))
    n_files = min(n_files, n_convs)
    marker = os.path.join(out_dir, "_GEN_OK")
    params = f"{n_convs},{avg_turns},{avg_tokens},{seed},{n_files},v1"
    paths = [
        os.path.join(out_dir, f"part-{i:05d}.parquet") for i in range(n_files)
    ]
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == params and all(os.path.exists(p) for p in paths):
                return paths
    os.makedirs(out_dir, exist_ok=True)
    bounds = np.linspace(0, n_convs, n_files + 1).astype(int)

    def _write_one(i: int) -> None:
        table = _gen_file(int(bounds[i]), int(bounds[i + 1]), seed, avg_turns, avg_tokens)
        tmp = paths[i] + ".tmp"
        pq.write_table(table, tmp, row_group_size=16384)
        os.replace(tmp, paths[i])

    if use_ray:
        import ray

        @ray.remote(num_cpus=1)
        def _remote_write(i: int) -> None:
            _write_one(i)

        ray.get([_remote_write.remote(i) for i in range(n_files)])
    else:
        for i in range(n_files):
            _write_one(i)
    tmp_marker = marker + ".tmp"
    with open(tmp_marker, "w") as f:
        f.write(params)
    os.replace(tmp_marker, marker)
    return paths
