"""Ray-Data-native inverted-index build pipeline (SURVEY.md §3.1 restated).

Replaces the reference's crawl-and-upsert build (ForkJoinPool crawler →
per-page ``new LemmaSearch()`` → row-at-a-time MySQL writes,
services/RecursiveSearch.java:46-162 and
services/IndexingServiceImpl.java:80-135) with a streaming Dataset
pipeline:

Two equivalent pipelines (byte-identical merged output, tested):

``pipeline="local"`` (default — the scale path).  The shuffle key of
the posting build is (input partition, term-bucket), and the partition
is fully determined by the input file — so posting rows never need to
cross workers.  One Ray task per partition streams its parquet
fragments, tokenizes (per-worker cached lemmatizer state — the ST1
load-once pattern), accumulates exploded postings to a budget and
flushes sorted compressed sub-segments ("per-partition spill"); doc
lengths and lineage stats are computed in-task.  The ONLY all-to-all
left is the merge groupby over compressed segment rows — at 100 TB the
big data moves zero times instead of once.

``pipeline="shuffle"`` (the textbook architecture, kept selectable):

  read_parquet(transcripts)                       (S1/S2 analog)
    → map_batches(tokenize, pyarrow, zero-copy)   task-based with
      per-worker cached state by default (``use_actor_pool=True`` for
      a classic actor pool); the reference pays dictionary load once
      per page (RecursiveSearch.java:68), we pay once per worker
    → exploded (term, doc_id, tf) with per-doc partial aggregation
      already done in-batch (A1 analog, LemmaSearch.java:50-53)
    → groupby(partition, term-bucket) shuffle → posting segments with
      delta-gap+varint blobs (A2 analog: df comes from the shuffle,
      not a shared counter — contrast RecursiveSearch.java:150-162)

Both then: LSM-style k-way merge of per-partition segments into the
global index + lexicon + meta (S6/S7 analog).

Deterministic doc_id: dense rank under stable (conv_id, turn_idx)
order, realized WITHOUT a global sort — conv offsets are computed from
a (small) groupby over conv_id and broadcast via ``ray.put``; then
``doc_id = offset[conv_id] + turn_idx`` (turn_idx is contiguous per
conversation by input contract; ``validate=True`` asserts it).  This is
SURVEY §7 hard-part (a)'s range-partition mitigation.

Skew: hot Zipf terms (df≈N) never form one giant shuffle group — the
group key is (input partition, crc32(term) % buckets), so a hot term's
per-group payload is bounded by the partition's doc count; the merge
stage then concatenates the per-partition sub-postings (doc-disjoint by
construction) and re-chunks rows at ``MAX_CHUNK`` docs so no single
allocation scales with global df.  This is the explicit salting design
of SURVEY §4 ("Skew / hot keys").

Checkpoint/resume: work proceeds in WAVES of partitions; each wave
writes its segments + doc lengths + a manifest (lineage: input files,
per-partition row counts, wall time) into a temp dir that is atomically
renamed into ``waves/``.  A present wave dir is complete by invariant;
resume skips partitions already covered by a committed wave.  The merge
is idempotent (tmp + rename) — mirrors & replaces the reference's
destructive re-init (IndexingServiceImpl.java:154-163, S8).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from raysearch.codec import (
    decode_posting_segments,
    encode_posting_segments,
)
from raysearch.lex import Lexer

MAX_CHUNK = 1 << 20  # max docs per merged posting row (bounds allocations)
DEFAULT_BUCKETS = 64


def term_bucket(term: str, buckets: int) -> int:
    """Deterministic shuffle bucket for a term (stable across processes,
    unlike builtin hash)."""
    return zlib.crc32(term.encode("utf-8")) % buckets


# ---------------------------------------------------------------------------
# Stage 0 — conv offsets (deterministic doc_id assignment backbone)
# ---------------------------------------------------------------------------


def _file_conv_agg(path: str) -> pa.Table:
    """Per-file (conv_id → max turn_idx [, count]) partial aggregate —
    reads only the two key columns."""
    t = pq.read_table(path, columns=["conv_id", "turn_idx"])
    import pandas as pd

    codes, uniq = pd.factorize(t["conv_id"].to_numpy(zero_copy_only=False))
    turn = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    mx = np.full(len(uniq), -1, dtype=np.int64)
    np.maximum.at(mx, codes, turn)
    cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
    return pa.table(
        {
            "conv_id": pa.array(uniq, pa.string()),
            "max_turn": pa.array(mx, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        }
    )


def _combine_conv_aggs(*tables: pa.Table) -> pa.Table:
    """Associative combine of per-file (conv_id, max_turn, cnt) partials."""
    combined = pa.concat_tables(tables)
    import pandas as pd

    codes, uniq = pd.factorize(combined["conv_id"].to_numpy(zero_copy_only=False))
    mt = combined["max_turn"].to_numpy(zero_copy_only=False)
    ct = combined["cnt"].to_numpy(zero_copy_only=False)
    mx = np.full(len(uniq), -1, dtype=np.int64)
    np.maximum.at(mx, codes, mt)
    cnt = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(cnt, codes, ct)
    return pa.table(
        {
            "conv_id": pa.array(uniq, pa.string()),
            "max_turn": pa.array(mx, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        }
    )


TREE_FANIN = 32  # per-file partials combined per tree-reduce task


def compute_conv_offsets(files: list[str], validate: bool = False):
    """Global (conv_id → first doc_id, n_turns) via parallel per-file
    partial aggregates + a TREE reduce of the combines.

    The wide input is reduced to one row per conversation; conv count ≪
    turn count, so materializing the final table on the driver is the
    deliberate range-partition alternative to a 10^12-row global sort
    (SURVEY §7 hard part (a)).  Per-file partials are plain Ray tasks;
    combines run as a fan-in-``TREE_FANIN`` reduction tree so neither
    the driver nor any single task ever holds more than fan-in partial
    tables at once.  Returns an arrow table sorted by conv_id."""
    import ray

    agg_remote = ray.remote(num_cpus=1)(_file_conv_agg)
    combine_remote = ray.remote(num_cpus=1)(_combine_conv_aggs)
    refs = [agg_remote.remote(p) for p in files]
    while len(refs) > TREE_FANIN:
        refs = [
            combine_remote.remote(*refs[i : i + TREE_FANIN])
            for i in range(0, len(refs), TREE_FANIN)
        ]
    combined = _combine_conv_aggs(*ray.get(refs))
    table = combined.rename_columns(
        ["conv_id", "max(turn_idx)", "row_count"]
    ).sort_by("conv_id")
    n_turns = pc.add(table["max(turn_idx)"], 1).cast(pa.int64())
    counts = n_turns.to_numpy()
    offsets = np.cumsum(counts) - counts
    out = pa.table(
        {
            "conv_id": table["conv_id"],
            "offset": pa.array(offsets, pa.int64()),
            "n_turns": pa.array(counts, pa.int64()),
        }
    )
    if validate:
        # D2 analog (RecursiveSearch.java:164-169): (conv_id, turn_idx)
        # unique AND contiguous from 0 — the per-conv row count must
        # equal max(turn_idx)+1 (a duplicated turn makes the count too
        # high or, with a compensating gap, fails the per-file dup
        # check inside _file_conv_agg's source reads downstream).
        rc = table["row_count"].to_numpy()
        bad = np.flatnonzero(rc != counts)
        if len(bad):
            c = table["conv_id"][int(bad[0])].as_py()
            raise ValueError(
                f"turn_idx not contiguous/unique for conv_id {c!r} "
                f"(rows={int(rc[bad[0]])}, max_turn+1={int(counts[bad[0]])})"
            )
    return out


def file_conv_ranges(files: list[str]) -> list[dict]:
    """Per-file conv_id min/max from parquet footer statistics — used by
    the doc-fetch path (M9 analog: title/text lookup without network,
    SearchServiceImpl.java:82-94 → point read with predicate pushdown)."""
    out = []
    for path in files:
        md = pq.ParquetFile(path).metadata
        cmin, cmax, rows = None, None, md.num_rows
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            st = col.statistics
            if st is not None and st.has_min_max:
                lo = st.min if isinstance(st.min, str) else st.min.decode()
                hi = st.max if isinstance(st.max, str) else st.max.decode()
                cmin = lo if cmin is None or lo < cmin else cmin
                cmax = hi if cmax is None or hi > cmax else cmax
        out.append({"path": path, "conv_min": cmin, "conv_max": cmax, "rows": rows})
    return out


# ---------------------------------------------------------------------------
# Stage 1 — tokenizer stage (ST1 analog: state loaded once per worker)
# ---------------------------------------------------------------------------

#: per-worker tokenizer state cache for the task-based stage: the ST1
#: "load once per worker" pattern without an actor pool — Ray reuses
#: worker processes across map tasks, so the state is constructed once
#: per (worker, build) and shared by every batch that worker processes.
#: Measured: a 30-actor pool spends ~6s of a 10s stage on actor startup
#: (cold interpreter per actor); warm task workers cut the stage 2-3x.
_WORKER_TOKENIZERS: dict[tuple, "TokenizerActor"] = {}

_ARROW_PINNED = False


def _pin_arrow_threads() -> None:
    """Each Ray worker gets num_cpus=1, but pyarrow's internal pools
    default to the MACHINE core count — 32 one-cpu workers would run
    ~32x32 threads and per-task wall time measurably 4x-es from the
    contention.  Pin once per worker process."""
    global _ARROW_PINNED
    if not _ARROW_PINNED:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        _ARROW_PINNED = True


def tokenize_batch(
    batch: pa.Table,
    *,
    offsets_ref,
    path2pid: dict[str, int],
    mode: str,
    buckets: int,
    strip_html: bool = False,
) -> pa.Table:
    """Task-based tokenize stage: resolves (and caches) the per-worker
    TokenizerActor state, then delegates to it."""
    key = (
        offsets_ref.hex() if hasattr(offsets_ref, "hex") else id(offsets_ref),
        mode,
        buckets,
        strip_html,
    )
    tok = _WORKER_TOKENIZERS.get(key)
    if tok is None:
        _pin_arrow_threads()
        _WORKER_TOKENIZERS.clear()  # one live build per worker is typical
        tok = _WORKER_TOKENIZERS[key] = TokenizerActor(
            offsets_ref, path2pid, mode, buckets, strip_html
        )
    return tok(batch)


class TokenizerActor:
    """Stateful lemmatizer stage (SURVEY §2.3 ST1).

    The reference constructs the morphology dictionary once per page
    (``new LemmaSearch()``, services/RecursiveSearch.java:68); this pool
    pays it once per actor in ``__init__`` and reuses it across batches.
    Per batch (zero-copy Arrow in): vectorized tokenize
    (lex.Lexer.token_parent_pairs), per-doc tf aggregation
    (LemmaSearch.java:50-53 semantics), and doc_id assignment from the
    broadcast conv-offset table.  Emits exploded posting rows
    (term, doc_id, tf, gkey) plus per-doc sentinel rows (term="",
    tf=doc_len, gkey=-pid-1) used to build the doc-length table.
    """

    def __init__(
        self,
        offsets_ref,
        path2pid: dict[str, int],
        mode: str,
        buckets: int,
        strip_html: bool = False,
    ):
        import ray

        _pin_arrow_threads()
        offsets = (
            ray.get(offsets_ref)
            if isinstance(offsets_ref, ray.ObjectRef)
            else offsets_ref
        )
        self.conv_arr = offsets["conv_id"].combine_chunks()
        self.offset_arr = offsets["offset"].to_numpy()
        self.path2pid = path2pid
        self.lexer = Lexer(mode)
        self.buckets = buckets
        self.strip_html = strip_html
        self._bucket_memo: dict[str, int] = {}

    def _strip_markup(self, texts: pa.ChunkedArray) -> pa.Array:
        """M1 analog (LemmaSearch.clearCodeFromTags,
        services/LemmaSearch.java:68-70), mostly vectorized: tag removal
        is one Arrow regex kernel; entity decode falls back to Python
        only for the rows that actually contain '&'."""
        import html

        no_tags = pc.replace_substring_regex(texts, r"<[^>]*>", "")
        if isinstance(no_tags, pa.ChunkedArray):
            no_tags = no_tags.combine_chunks()
        has_amp = pc.match_substring(no_tags, "&").to_numpy(zero_copy_only=False)
        if has_amp.any():
            vals = no_tags.to_pylist()
            for i in np.flatnonzero(has_amp):
                vals[i] = html.unescape(vals[i])
            no_tags = pa.array(vals, pa.string())
        return no_tags

    def _pid_of(self, path: str) -> int:
        pid = self.path2pid.get(path)
        if pid is None:
            pid = self.path2pid.get(os.path.basename(path))
        if pid is None:
            raise KeyError(f"unknown input fragment {path!r}")
        return pid

    def explode_arrays(self, batch: pa.Table):
        """Vectorized core: batch → (doc_ids per row, doc_len per row,
        p_row posting→row index, p_term, p_tf, p_bucket)."""
        n_rows = batch.num_rows
        conv_idx = pc.index_in(batch["conv_id"], value_set=self.conv_arr)
        conv_idx_np = conv_idx.to_numpy(zero_copy_only=False)
        if np.any(conv_idx_np < 0) or conv_idx.null_count:
            raise KeyError("conv_id missing from offset table")
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_ids = self.offset_arr[conv_idx_np] + turn
        texts = batch["text"]
        if self.strip_html:
            texts = self._strip_markup(texts)
        parent, codes, uniq = self.lexer.token_parent_codes(texts)
        if len(codes):
            n_uniq = len(uniq)
            key = parent.astype(np.int64) * n_uniq + codes
            uniq_keys, tf = np.unique(key, return_counts=True)
            p_row = uniq_keys // n_uniq
            ucodes = uniq_keys % n_uniq
            bmemo = self._bucket_memo
            buckets = np.array(
                [
                    bmemo.get(t)
                    if t in bmemo
                    else bmemo.setdefault(t, term_bucket(t, self.buckets))
                    for t in uniq
                ],
                dtype=np.int64,
            )
            p_tf = tf.astype(np.int64)
            doc_len = np.bincount(parent, minlength=n_rows).astype(np.int64)
        else:
            p_row = np.empty(0, dtype=np.int64)
            ucodes = np.empty(0, dtype=np.int64)
            p_tf = np.empty(0, dtype=np.int64)
            buckets = np.empty(0, dtype=np.int64)
            uniq = np.empty(0, dtype=object)
            doc_len = np.zeros(n_rows, dtype=np.int64)
        return doc_ids, doc_len, p_row, ucodes, p_tf, uniq, buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        if n_rows == 0:
            return _empty_exploded()
        paths = batch["path"].to_pylist() if "path" in batch.column_names else None
        if paths is None:
            pids = np.zeros(n_rows, dtype=np.int64)
        else:
            memo: dict[str, int] = {}
            pids = np.array(
                [
                    memo[p] if p in memo else memo.setdefault(p, self._pid_of(p))
                    for p in paths
                ],
                dtype=np.int64,
            )
        doc_ids, doc_len, p_row, ucodes, p_tf, uniq, ubuckets = self.explode_arrays(
            batch
        )
        p_term = uniq[ucodes] if len(ucodes) else np.empty(0, dtype=object)
        p_doc = doc_ids[p_row]
        p_gkey = pids[p_row] * self.buckets + (
            ubuckets[ucodes] if len(ucodes) else np.empty(0, dtype=np.int64)
        )

        term_col = pa.array(
            np.concatenate([p_term, np.full(n_rows, "", dtype=object)]), pa.string()
        )
        doc_col = pa.array(np.concatenate([p_doc, doc_ids]), pa.int64())
        tf_col = pa.array(np.concatenate([p_tf, doc_len]), pa.int64())
        gkey_col = pa.array(np.concatenate([p_gkey, -pids - 1]), pa.int64())
        return pa.table(
            {"term": term_col, "doc_id": doc_col, "tf": tf_col, "gkey": gkey_col}
        )


def _empty_exploded() -> pa.Table:
    return pa.table(
        {
            "term": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
            "gkey": pa.array([], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Stage 1b — partition-local segment build (the scale path)
# ---------------------------------------------------------------------------

#: exploded-posting buffer budget per partition before an early flush
#: writes a partial (doc-disjoint) sub-segment — the "per-partition
#: spill" of the north star.  ~24 bytes/posting + term strings.
DEFAULT_SPILL_ROWS = 8_000_000


def _encode_partition_segment(
    codes: np.ndarray, uniq_terms: np.ndarray, docs: np.ndarray,
    tfs: np.ndarray, pid: int, buckets: int, bucket_memo: dict,
) -> pa.Table:
    """Sort one partition's exploded (term-code, doc, tf) rows and
    encode per-term posting rows (bucket assigned per term by hash).
    Terms arrive as integer codes into ``uniq_terms`` — the Python-level
    work is bounded by the partition VOCABULARY, not its postings."""
    if len(codes) == 0:
        return _empty_segment()
    uniq_order = np.argsort(uniq_terms)
    rank_of_code = np.empty(len(uniq_terms), dtype=np.int64)
    rank_of_code[uniq_order] = np.arange(len(uniq_terms))
    order = np.lexsort((docs, rank_of_code[codes]))
    s_codes = rank_of_code[codes][order]
    starts = np.flatnonzero(np.concatenate(([True], s_codes[1:] != s_codes[:-1])))
    sorted_uniq = uniq_terms[uniq_order]
    enc = encode_posting_segments(docs[order], tfs[order], starts)
    seg_terms = sorted_uniq[s_codes[starts]]
    b = np.array(
        [
            bucket_memo.get(t)
            if t in bucket_memo
            else bucket_memo.setdefault(t, term_bucket(t, buckets))
            for t in seg_terms
        ],
        dtype=np.int64,
    )
    out = {
        "term": seg_terms.astype(object),
        "partition_id": np.full(len(starts), pid, dtype=np.int64),
        "bucket": b,
        "df": enc["df"], "cf": enc["cf"], "max_tf": enc["max_tf"],
        "first_doc": enc["first_doc"], "last_doc": enc["last_doc"],
        "doc_blob": enc["doc_blob"], "tf_blob": enc["tf_blob"],
        "bm_blob": enc["bm_blob"],
    }
    return _segment_table(out)


def _atomic_write_table(
    table: pa.Table, path: str, row_group_size: int | None = None
) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp, row_group_size=row_group_size)
    os.replace(tmp, path)


def build_partition_task(
    batch: pa.Table,
    *,
    offsets_ref,
    mode: str,
    buckets: int,
    strip_html: bool,
    wave_tmp: str,
    spill_rows: int = DEFAULT_SPILL_ROWS,
    read_batch_rows: int = 32768,
) -> pa.Table:
    """One task per input partition: stream its parquet fragments
    (record-batch granularity), tokenize with the shared per-worker
    state, accumulate exploded postings up to ``spill_rows``, and flush
    sorted, compressed sub-segments.  Because input is consumed in doc
    order, flushed sub-segments are doc-DISJOINT per term, so the merge
    stage concatenates them like any other per-partition rows — spill
    costs no extra merge complexity.

    No shuffle: a partition's postings never leave the worker (gkey is
    file-determined, SURVEY §4 skew note); the only all-to-all in the
    build is the merge over compressed segment rows.  Segment and
    doc-length files are written with deterministic names (idempotent
    under Ray task retry); returns one stats row per partition
    (manifest lineage/metrics)."""
    key = (
        offsets_ref.hex() if hasattr(offsets_ref, "hex") else id(offsets_ref),
        mode,
        buckets,
        strip_html,
    )
    tok = _WORKER_TOKENIZERS.get(key)
    if tok is None:
        _pin_arrow_threads()
        _WORKER_TOKENIZERS.clear()
        tok = _WORKER_TOKENIZERS[key] = TokenizerActor(
            offsets_ref, {}, mode, buckets, strip_html
        )
    out_rows = {
        "partition_id": [], "n_docs": [], "n_tokens": [], "n_terms": [],
        "n_postings": [], "n_flushes": [], "wall_s": [],
    }
    for row in range(batch.num_rows):
        pid = int(batch["pid"][row].as_py())
        files = batch["files"][row].as_py()
        t0 = time.monotonic()
        # partition-level vocabulary: batch-local codes are remapped to
        # stable partition codes (Python work ∝ per-batch vocab, not
        # postings); posting buffers are pure int64 arrays
        part_vocab: dict[str, int] = {}
        part_terms: list[str] = []
        code_buf: list[np.ndarray] = []
        doc_buf: list[np.ndarray] = []
        tf_buf: list[np.ndarray] = []
        dl_doc: list[np.ndarray] = []
        dl_len: list[np.ndarray] = []
        n_buf = 0
        flush_i = 0
        n_postings = 0

        def flush():
            nonlocal n_buf, flush_i
            if not n_buf:
                return
            seg = _encode_partition_segment(
                np.concatenate(code_buf),
                np.array(part_terms, dtype=object),
                np.concatenate(doc_buf),
                np.concatenate(tf_buf),
                pid,
                buckets,
                tok._bucket_memo,
            )
            _atomic_write_table(
                seg,
                os.path.join(
                    wave_tmp, "segments", f"pid-{pid:05d}-f{flush_i:03d}.parquet"
                ),
            )
            code_buf.clear()
            doc_buf.clear()
            tf_buf.clear()
            n_buf = 0
            flush_i += 1

        for path in files:
            pf = pq.ParquetFile(path)
            for rb in pf.iter_batches(
                batch_size=read_batch_rows, columns=["conv_id", "turn_idx", "text"]
            ):
                tbl = pa.Table.from_batches([rb])
                doc_ids, doc_len, p_row, ucodes, p_tf, uniq, _ = (
                    tok.explode_arrays(tbl)
                )
                if len(ucodes):
                    remap = np.empty(len(uniq), dtype=np.int64)
                    for i, t in enumerate(uniq):
                        c = part_vocab.get(t)
                        if c is None:
                            c = part_vocab[t] = len(part_terms)
                            part_terms.append(t)
                        remap[i] = c
                    code_buf.append(remap[ucodes])
                    doc_buf.append(doc_ids[p_row])
                    tf_buf.append(p_tf)
                dl_doc.append(doc_ids)
                dl_len.append(doc_len)
                n_buf += len(ucodes)
                n_postings += len(ucodes)
                if n_buf >= spill_rows:
                    flush()
        flush()
        docs = np.concatenate(dl_doc) if dl_doc else np.empty(0, np.int64)
        lens = np.concatenate(dl_len) if dl_len else np.empty(0, np.int64)
        _atomic_write_table(
            pa.table(
                {
                    "doc_id": pa.array(docs, pa.int64()),
                    "doc_len": pa.array(lens, pa.int64()),
                    "partition_id": pa.array(
                        np.full(len(docs), pid), pa.int32()
                    ),
                }
            ),
            os.path.join(wave_tmp, "doclens", f"pid-{pid:05d}.parquet"),
        )
        out_rows["partition_id"].append(pid)
        out_rows["n_docs"].append(int(len(docs)))
        out_rows["n_tokens"].append(int(lens.sum()))
        out_rows["n_terms"].append(len(part_terms))
        out_rows["n_postings"].append(int(n_postings))
        out_rows["n_flushes"].append(flush_i)
        out_rows["wall_s"].append(round(time.monotonic() - t0, 3))
    return pa.table(
        {
            "partition_id": pa.array(out_rows["partition_id"], pa.int64()),
            "n_docs": pa.array(out_rows["n_docs"], pa.int64()),
            "n_tokens": pa.array(out_rows["n_tokens"], pa.int64()),
            "n_terms": pa.array(out_rows["n_terms"], pa.int64()),
            "n_postings": pa.array(out_rows["n_postings"], pa.int64()),
            "n_flushes": pa.array(out_rows["n_flushes"], pa.int64()),
            "wall_s": pa.array(out_rows["wall_s"], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Stage 2 — per-(partition, bucket) posting build (A2 analog)
# ---------------------------------------------------------------------------


def build_bucket_postings(group: pa.Table, buckets: int) -> pa.Table:
    """Build compressed posting rows for one (partition, term-bucket)
    group: sort (term, doc_id) → per-term delta-gap+varint blobs.

    One Arrow row per term per partition replaces the reference's one
    SQL row per (lemma, page) (model/SearchIndex.java:12-27); df is the
    per-term doc count within the partition."""
    import pandas as pd

    _pin_arrow_threads()
    if group.num_rows == 0:
        return _empty_segment()
    gkey = int(group["gkey"][0].as_py())
    pid, bucket = divmod(gkey, buckets)
    terms = group["term"].to_numpy(zero_copy_only=False)
    doc_ids = group["doc_id"].to_numpy(zero_copy_only=False)
    tfs = group["tf"].to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(terms)
    # order terms lexically so segment rows come out term-sorted
    uniq_order = np.argsort(uniq)
    rank_of_code = np.empty(len(uniq), dtype=np.int64)
    rank_of_code[uniq_order] = np.arange(len(uniq))
    order = np.lexsort((doc_ids, rank_of_code[codes]))
    s_codes = rank_of_code[codes][order]
    s_docs = doc_ids[order]
    s_tfs = tfs[order]
    starts = np.flatnonzero(np.concatenate(([True], s_codes[1:] != s_codes[:-1])))
    sorted_uniq = uniq[uniq_order]
    enc = encode_posting_segments(s_docs, s_tfs, starts)
    n_terms = len(starts)
    out = {
        "term": sorted_uniq[s_codes[starts]].astype(object),
        "partition_id": np.full(n_terms, pid, dtype=np.int64),
        "bucket": np.full(n_terms, bucket, dtype=np.int64),
        "df": enc["df"], "cf": enc["cf"], "max_tf": enc["max_tf"],
        "first_doc": enc["first_doc"], "last_doc": enc["last_doc"],
        "doc_blob": enc["doc_blob"], "tf_blob": enc["tf_blob"],
        "bm_blob": enc["bm_blob"],
    }
    return _segment_table(out)


def _segment_schema() -> pa.Schema:
    return pa.schema(
        [
            ("term", pa.string()), ("partition_id", pa.int32()),
            ("bucket", pa.int32()), ("df", pa.int64()), ("cf", pa.int64()),
            ("max_tf", pa.int64()), ("first_doc", pa.int64()),
            ("last_doc", pa.int64()), ("doc_blob", pa.binary()),
            ("tf_blob", pa.binary()), ("bm_blob", pa.binary()),
        ]
    )


def _segment_table(out: dict) -> pa.Table:
    schema = _segment_schema()
    return pa.table(
        {f.name: pa.array(out[f.name], f.type) for f in schema}, schema=schema
    )


def _empty_segment() -> pa.Table:
    return _segment_table({f.name: [] for f in _segment_schema()})


# ---------------------------------------------------------------------------
# Stage 3 — LSM-style merge (per-bucket k-way concat of doc-disjoint subs)
# ---------------------------------------------------------------------------


def merge_bucket(
    group: pa.Table,
    max_chunk: int = MAX_CHUNK,
    conv_starts: np.ndarray | None = None,
) -> tuple[pa.Table, np.ndarray | None]:
    """Merge one bucket's per-partition sub-postings into global posting
    rows, re-chunked at MAX_CHUNK docs.  Sub-postings are doc-disjoint
    (a doc lives in exactly one partition) and arrive in (term,
    first_doc) order, so the merge is one vectorized decode of every
    blob, a segmented-order audit, and one vectorized re-encode; hot
    terms (df≈N) emit multiple chunk rows instead of one giant blob.

    When ``conv_starts`` (the conv→first-doc offset array) is given,
    also returns this bucket's distinct-lemma count per conversation
    (DetailedStatisticsItem lemma-count analog,
    StatisticsServiceImpl.java:34-70): buckets partition the term
    space, so per-conv distinct (term, conv) pairs are disjoint across
    buckets and the global count is the sum of the per-bucket sidecars.
    Because posting doc_ids are ascending within each term segment,
    conv indices are non-decreasing there too — distinct pairs are just
    segment starts plus conv-change boundaries: one ``searchsorted``
    plus O(n) compares over values this task already decoded, no extra
    decode and no shuffle."""
    import pandas as pd

    _pin_arrow_threads()
    if group.num_rows == 0:
        return _empty_merged(), None
    terms = group["term"].to_numpy(zero_copy_only=False)
    first = group["first_doc"].to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(terms)
    uniq_order = np.argsort(uniq)
    rank_of_code = np.empty(len(uniq), dtype=np.int64)
    rank_of_code[uniq_order] = np.arange(len(uniq))
    ranks = rank_of_code[codes]
    order = np.lexsort((first, ranks))
    bucket = int(group["bucket"][0].as_py())
    doc_blobs = group["doc_blob"].to_pylist()
    tf_blobs = group["tf_blob"].to_pylist()
    row_df = group["df"].to_numpy(zero_copy_only=False)

    # one vectorized decode across ALL rows (in merged row order)
    d, t, row_starts = decode_posting_segments(
        [doc_blobs[r] for r in order],
        [tf_blobs[r] for r in order],
        row_df[order],
    )
    # term segment boundaries in value space
    sorted_ranks = ranks[order]
    term_row_starts = np.flatnonzero(
        np.concatenate(([True], sorted_ranks[1:] != sorted_ranks[:-1]))
    )
    term_val_starts = row_starts[term_row_starts]
    n_vals = len(d)
    if n_vals == 0:
        return _empty_merged(), None
    term_val_ends = np.concatenate((term_val_starts[1:], [n_vals]))

    # order audit: doc-disjoint partitions concatenated by first_doc are
    # already ascending; sort (and dup-check) only the terms that aren't
    interior = np.ones(n_vals, dtype=bool)
    interior[term_val_starts] = False
    bad = np.flatnonzero(interior & (np.diff(np.concatenate(([d[0] - 1], d))) <= 0))
    if len(bad):
        term_of_val = np.repeat(
            np.arange(len(term_val_starts)),
            term_val_ends - term_val_starts,
        )
        for ti in np.unique(term_of_val[bad]):
            s, e = term_val_starts[ti], term_val_ends[ti]
            o = np.argsort(d[s:e], kind="stable")
            d[s:e], t[s:e] = d[s:e][o], t[s:e][o]
            if np.any(np.diff(d[s:e]) == 0):
                raise ValueError(
                    f"duplicate doc_id in postings of "
                    f"{uniq[uniq_order][ti]!r}"
                )

    # per-conv distinct-lemma partials (see docstring) — after the
    # audit, so doc_ids (hence conv indices) ascend within each segment
    conv_counts = None
    if conv_starts is not None:
        conv_of_val = (
            np.searchsorted(conv_starts, d, side="right") - 1
        ).astype(np.int64)
        keep = np.empty(n_vals, dtype=bool)
        keep[0] = True
        keep[1:] = conv_of_val[1:] != conv_of_val[:-1]
        keep[term_val_starts] = True
        conv_counts = np.bincount(
            conv_of_val[keep], minlength=len(conv_starts)
        ).astype(np.int64)

    # re-chunk each term at MAX_CHUNK and encode everything in one pass
    sorted_terms = uniq[uniq_order]
    chunk_starts, chunk_term, chunk_ids = [], [], []
    for ti, (s, e) in enumerate(zip(term_val_starts, term_val_ends)):
        for ci, cs in enumerate(range(int(s), int(e), max_chunk)):
            chunk_starts.append(cs)
            chunk_term.append(ti)
            chunk_ids.append(ci)
    enc = encode_posting_segments(d, t, np.array(chunk_starts, dtype=np.int64))
    out = {
        "term": sorted_terms[np.array(chunk_term, dtype=np.int64)].astype(object),
        "bucket": np.full(len(chunk_starts), bucket, dtype=np.int64),
        "chunk_id": np.array(chunk_ids, dtype=np.int64),
        "df": enc["df"], "cf": enc["cf"], "max_tf": enc["max_tf"],
        "first_doc": enc["first_doc"], "last_doc": enc["last_doc"],
        "doc_blob": enc["doc_blob"], "tf_blob": enc["tf_blob"],
        "bm_blob": enc["bm_blob"],
    }
    return _merged_table(out), conv_counts


def _merged_schema() -> pa.Schema:
    return pa.schema(
        [
            ("term", pa.string()), ("bucket", pa.int32()),
            ("chunk_id", pa.int32()), ("df", pa.int64()), ("cf", pa.int64()),
            ("max_tf", pa.int64()), ("first_doc", pa.int64()),
            ("last_doc", pa.int64()), ("doc_blob", pa.binary()),
            ("tf_blob", pa.binary()), ("bm_blob", pa.binary()),
        ]
    )


def _merged_table(out: dict) -> pa.Table:
    schema = _merged_schema()
    return pa.table(
        {f.name: pa.array(out[f.name], f.type) for f in schema}, schema=schema
    )


def _empty_merged() -> pa.Table:
    return _merged_table({f.name: [] for f in _merged_schema()})


def _split_by_bucket(path: str, buckets: int) -> list[pa.Table]:
    """Map side of the merge exchange: one segment file → per-bucket
    sub-tables (rows already carry their bucket)."""
    _pin_arrow_threads()
    t = pq.read_table(path)
    b = t["bucket"].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    sorted_t = t.take(pa.array(order))
    sb = b[order]
    out = []
    counts = np.bincount(sb, minlength=buckets)
    pos = 0
    for n in counts:
        out.append(sorted_t.slice(pos, int(n)))
        pos += int(n)
    return out


#: posting rows per parquet row group in the merged index — small
#: enough that a term point-read touches one-ish row group, large
#: enough to amortize parquet overhead
POSTING_RG_ROWS = 2048


def _merge_bucket_task(
    out_path: str,
    lex_path: str,
    loc_path: str,
    convlex_path: str | None,
    max_chunk: int,
    conv_starts: np.ndarray | None,
    *tables: pa.Table,
) -> int:
    """Reduce side: merge one bucket's rows from every segment file,
    write the merged posting rows (fixed ``POSTING_RG_ROWS`` row
    groups), the bucket's lexicon slice, AND the term→row-group locator
    sidecar — the merge task knows exactly which row group every term's
    chunks land in, so searchers load the locator instead of scanning
    the ``term`` column of every posting row group at startup
    (round-1 cost; VERDICT #6/#7).  Buckets partition the term space,
    so the global lexicon/locator is just the concatenation — no
    driver-side scan over the merged index.  Atomic renames;
    idempotent."""
    _pin_arrow_threads()
    live = [t for t in tables if t.num_rows]
    if not live:
        return 0
    merged, conv_counts = merge_bucket(
        pa.concat_tables(live), max_chunk=max_chunk, conv_starts=conv_starts
    )
    if convlex_path is not None and conv_counts is not None:
        # sparse sidecar: only convs this bucket's terms touch
        nz = np.flatnonzero(conv_counts)
        _atomic_write_table(
            pa.table(
                {
                    "conv_idx": pa.array(nz, pa.int64()),
                    "lemmas": pa.array(conv_counts[nz], pa.int64()),
                }
            ),
            convlex_path,
        )
    if merged.num_rows:
        _atomic_write_table(merged, out_path, row_group_size=POSTING_RG_ROWS)
        import pandas as pd

        terms = merged["term"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(terms)  # rows are term-sorted already
        df = np.zeros(len(uniq), dtype=np.int64)
        cf = np.zeros(len(uniq), dtype=np.int64)
        nch = np.bincount(codes, minlength=len(uniq))
        np.add.at(df, codes, merged["df"].to_numpy())
        np.add.at(cf, codes, merged["cf"].to_numpy())
        _atomic_write_table(
            pa.table(
                {
                    "term": pa.array(uniq, pa.string()),
                    "df": pa.array(df, pa.int64()),
                    "cf": pa.array(cf, pa.int64()),
                    "n_chunks": pa.array(nch.astype(np.int64), pa.int64()),
                    "bucket": pa.array(
                        np.full(len(uniq), int(merged["bucket"][0].as_py())),
                        pa.int64(),
                    ),
                }
            ),
            lex_path,
        )
        # locator sidecar: distinct (term, row_group) — row group index
        # is row_index // POSTING_RG_ROWS by construction of the write
        rgs = np.arange(merged.num_rows, dtype=np.int64) // POSTING_RG_ROWS
        pair = codes.astype(np.int64) * (rgs.max() + 1) + rgs
        keep = np.concatenate(([True], pair[1:] != pair[:-1]))
        _atomic_write_table(
            pa.table(
                {
                    "term": pa.array(terms[keep], pa.string()),
                    "row_group": pa.array(rgs[keep], pa.int64()),
                }
            ),
            loc_path,
        )
    return merged.num_rows


def run_merge(
    seg_files: list[str],
    out_dir: str,
    buckets: int,
    lex_dir: str | None = None,
    max_chunk: int = MAX_CHUNK,
    loc_dir: str | None = None,
    convlex_dir: str | None = None,
    conv_starts: np.ndarray | None = None,
) -> None:
    """LSM merge as an explicit two-phase Ray-task exchange.

    Ray Data's ``groupby("bucket").map_groups`` key-SORTS the blocks;
    sorting rows whose payload is KB-sized binary blobs measured 24s for
    150 MB of segments at 32 CPUs (hash shuffle: 83-120s).  The
    semantics only need partitioning, not order, so this does it
    directly: one map task per segment file splits rows by bucket
    (num_returns=buckets), one reduce task per bucket concatenates its
    sub-tables, merges, and writes — same data movement a multi-node
    shuffle needs, none of the sort.  This is the one deliberate raw
    ``@ray.remote`` stage in the engine (SURVEY §2 guidance: drop below
    the Dataset API only where it can't express the semantics)."""
    import ray

    lex_dir = lex_dir or out_dir
    loc_dir = loc_dir or lex_dir
    use_conv = convlex_dir is not None and conv_starts is not None
    todo = [
        b
        for b in range(buckets)
        if not (
            os.path.exists(os.path.join(out_dir, f"bucket-{b:04d}.parquet"))
            and os.path.exists(os.path.join(lex_dir, f"lexicon-{b:04d}.parquet"))
            and os.path.exists(os.path.join(loc_dir, f"termloc-{b:04d}.parquet"))
            and (
                not use_conv
                or os.path.exists(
                    os.path.join(convlex_dir, f"convlex-{b:04d}.parquet")
                )
            )
        )
    ]
    if not todo:
        return
    split_remote = ray.remote(num_cpus=1, num_returns=buckets)(_split_by_bucket)
    merge_remote = ray.remote(num_cpus=1)(_merge_bucket_task)
    conv_ref = ray.put(conv_starts) if use_conv else None
    parts = [split_remote.remote(f, buckets) for f in seg_files]
    if buckets == 1:
        parts = [[p] for p in parts]
    futs = [
        merge_remote.remote(
            os.path.join(out_dir, f"bucket-{b:04d}.parquet"),
            os.path.join(lex_dir, f"lexicon-{b:04d}.parquet"),
            os.path.join(loc_dir, f"termloc-{b:04d}.parquet"),
            os.path.join(convlex_dir, f"convlex-{b:04d}.parquet")
            if use_conv
            else None,
            max_chunk,
            conv_ref,
            *[p[b] for p in parts],
        )
        for b in todo
    ]
    ray.get(futs)


# ---------------------------------------------------------------------------
# Driver orchestration: waves, manifests, merge, meta
# ---------------------------------------------------------------------------


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, default=str)
    os.replace(tmp, path)


def _committed_partitions(out_dir: str) -> tuple[set[int], list[str]]:
    pids: set[int] = set()
    waves: list[str] = []
    wave_root = os.path.join(out_dir, "waves")
    if not os.path.isdir(wave_root):
        return pids, waves
    for d in sorted(os.listdir(wave_root)):
        wdir = os.path.join(wave_root, d)
        mpath = os.path.join(wdir, "manifest.json")
        if not os.path.isfile(mpath):
            # invariant: wave dirs are renamed into place complete —
            # anything else is a crashed attempt; drop it
            shutil.rmtree(wdir, ignore_errors=True)
            continue
        with open(mpath) as f:
            manifest = json.load(f)
        pids.update(int(p) for p in manifest["partitions"])
        waves.append(d)
    return pids, waves


def partitions_of(out_dir: str, conv_id: str) -> list[int]:
    """ALL input partitions whose file conv ranges cover conv_id (the
    §3.3 'which partition owns this page' lookup;
    IndexingServiceImpl.java:173-183 analog).  A conversation's rows may
    legally straddle file (and thus partition) boundaries — only gen.py
    happens to keep conversations file-contiguous — so rebuild-by-conv
    must evict EVERY covering partition, not just the first match."""
    with open(os.path.join(out_dir, "input_meta.json")) as f:
        input_meta = json.load(f)
    files = input_meta["files"]
    n_partitions = input_meta["n_partitions"]
    bounds = np.linspace(0, len(files), n_partitions + 1).astype(int)
    pids: list[int] = []
    for fi, fr in enumerate(input_meta["file_ranges"]):
        if (fr["conv_min"] is None or fr["conv_min"] <= conv_id) and (
            fr["conv_max"] is None or conv_id <= fr["conv_max"]
        ):
            # file index → partition index (bounds are file offsets)
            pid = int(np.searchsorted(bounds, fi, side="right") - 1)
            if pid not in pids:
                pids.append(pid)
    if not pids:
        raise KeyError(f"no input fragment covers conv_id {conv_id!r}")
    return pids


def partition_of(out_dir: str, conv_id: str, turn_idx: int = 0) -> int:
    """First covering partition (see :func:`partitions_of`)."""
    return partitions_of(out_dir, conv_id)[0]


def evict_partition(out_dir: str, partition_id: int) -> list[str]:
    """Remove one partition's contribution from its committed wave(s).

    Crash-safe ordering: the old wave dir is deleted BEFORE the filtered
    replacement is renamed in — a crash in between only loses committed
    partitions, which a subsequent resume recomputes (idempotent), never
    duplicates them.  Returns the rewritten wave names."""
    wave_root = os.path.join(out_dir, "waves")
    touched = []
    _, waves = _committed_partitions(out_dir)
    for wname in waves:
        wdir = os.path.join(wave_root, wname)
        with open(os.path.join(wdir, "manifest.json")) as f:
            manifest = json.load(f)
        pids = [int(p) for p in manifest["partitions"]]
        if partition_id not in pids:
            continue
        rest = [p for p in pids if p != partition_id]
        if not rest:
            shutil.rmtree(wdir)
            touched.append(wname)
            continue
        new_name = f"{wname}-x{partition_id}"
        tmp = os.path.join(wave_root, "_tmp_" + new_name)
        shutil.rmtree(tmp, ignore_errors=True)
        for sub in ("segments", "doclens"):
            os.makedirs(os.path.join(tmp, sub))
            col = "partition_id"
            for fp in sorted(glob.glob(os.path.join(wdir, sub, "*.parquet"))):
                t = pq.read_table(fp)
                t = t.filter(pc.not_equal(t[col], partition_id))
                if t.num_rows:
                    pq.write_table(t, os.path.join(tmp, sub, os.path.basename(fp)))
        manifest["partitions"] = rest
        manifest["per_partition"].pop(str(partition_id), None)
        manifest["rebuilt_from"] = wname
        _atomic_write_json(os.path.join(tmp, "manifest.json"), manifest)
        shutil.rmtree(wdir)
        os.replace(tmp, os.path.join(wave_root, new_name))
        touched.append(new_name)
    return touched


def rebuild_partition(
    transcripts_dir: str,
    out_dir: str,
    partition_id: int | None = None,
    conv_id: str | None = None,
) -> dict:
    """Partition-scoped rebuild + re-merge (§3.3 restated: the
    reference's single-page reindex deletes the page's postings,
    decrements dfs and re-crawls one URL,
    IndexingServiceImpl.java:173-198; here the unit of incremental
    recompute is an input partition — its segment is evicted and
    rebuilt, then the idempotent LSM merge reruns over the new wave
    set, which also restores df/cf in lexicon + meta)."""
    if partition_id is not None:
        pids = [partition_id]
    elif conv_id is not None:
        pids = partitions_of(out_dir, conv_id)
    else:
        raise ValueError("need partition_id or conv_id")
    for pid in pids:
        evict_partition(out_dir, pid)
    return build_index(transcripts_dir, out_dir, resume=True)


def build_index(
    transcripts_dir: str,
    out_dir: str,
    mode: str = "latin",
    n_partitions: int | None = None,
    buckets: int = DEFAULT_BUCKETS,
    wave_size: int | None = None,
    batch_size: int | None = None,
    resume: bool = True,
    validate: bool = False,
    strip_html: bool = False,
    use_actor_pool: bool = False,
    pipeline: str = "local",
    spill_rows: int = DEFAULT_SPILL_ROWS,
    max_chunk: int = MAX_CHUNK,
    read_batch_rows: int = 32768,
) -> dict:
    """Build (or resume) the inverted index; returns the final meta dict.

    ``wave_size`` bounds how many partitions commit atomically together
    (None = all remaining in one fully-pipelined wave); smaller waves
    trade pipeline overlap for finer-grained resume.
    """
    import ray
    import ray.data as rd

    t_start = time.monotonic()
    files = sorted(glob.glob(os.path.join(transcripts_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {transcripts_dir}")
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    if n_partitions is None:
        n_partitions = max(1, min(len(files), 2 * ncpu))
    n_partitions = min(n_partitions, len(files))
    os.makedirs(os.path.join(out_dir, "waves"), exist_ok=True)

    # ---- stage 0: conv offsets + input meta (resume-aware) ----
    offsets_path = os.path.join(out_dir, "conv_offsets.parquet")
    input_meta_path = os.path.join(out_dir, "input_meta.json")
    if resume and os.path.exists(offsets_path) and os.path.exists(input_meta_path):
        offsets = pq.read_table(offsets_path)
        with open(input_meta_path) as f:
            input_meta = json.load(f)
        if input_meta["files"] != files:
            raise ValueError("input file list changed; use a fresh out_dir")
        n_partitions = input_meta["n_partitions"]
        buckets = input_meta["buckets"]
        mode = input_meta["mode"]
        strip_html = input_meta.get("strip_html", False)
    else:
        offsets = compute_conv_offsets(files, validate=validate)
        tmp = offsets_path + ".tmp"
        pq.write_table(offsets, tmp)
        os.replace(tmp, offsets_path)
        input_meta = {
            "files": files,
            "file_ranges": file_conv_ranges(files),
            "n_partitions": n_partitions,
            "buckets": buckets,
            "mode": mode,
            "strip_html": strip_html,
            "n_docs": int(pc.sum(offsets["n_turns"]).as_py()),
        }
        _atomic_write_json(input_meta_path, input_meta)

    n_docs = input_meta["n_docs"]
    bounds = np.linspace(0, len(files), n_partitions + 1).astype(int)
    part_files = {
        pid: files[bounds[pid] : bounds[pid + 1]] for pid in range(n_partitions)
    }
    path2pid = {}
    for pid, fl in part_files.items():
        for p in fl:
            path2pid[p] = pid
            path2pid[os.path.basename(p)] = pid

    committed, _ = _committed_partitions(out_dir) if resume else (set(), [])
    remaining = [p for p in range(n_partitions) if p not in committed]
    offsets_ref = ray.put(offsets) if remaining else None

    if wave_size is None:
        wave_batches = [remaining] if remaining else []
    else:
        wave_batches = [
            remaining[i : i + wave_size] for i in range(0, len(remaining), wave_size)
        ]

    stage_times: dict[str, float] = {"setup": round(time.monotonic() - t_start, 3)}

    for wave_pids in wave_batches:
        wave_t0 = time.monotonic()
        wave_files = [f for p in wave_pids for f in part_files[p]]
        wave_name = f"w-{wave_pids[0]:05d}-{len(wave_pids)}"
        wave_tmp = os.path.join(out_dir, "waves", "_tmp_" + wave_name)
        shutil.rmtree(wave_tmp, ignore_errors=True)
        os.makedirs(os.path.join(wave_tmp, "segments"))
        os.makedirs(os.path.join(wave_tmp, "doclens"))

        if pipeline == "local":
            # partition-local build: one task per partition streams its
            # fragments, tokenizes, and writes sorted sub-segments with
            # bounded-memory spill — NO posting-row shuffle (the only
            # all-to-all left is the merge over compressed segments)
            descs = pa.table(
                {
                    "pid": pa.array(wave_pids, pa.int64()),
                    "files": pa.array(
                        [part_files[p] for p in wave_pids],
                        pa.list_(pa.string()),
                    ),
                }
            )
            stats_tbl = (
                rd.from_arrow(descs)
                .repartition(len(wave_pids))
                .map_batches(
                    build_partition_task,
                    fn_kwargs={
                        "offsets_ref": offsets_ref,
                        "mode": mode,
                        "buckets": buckets,
                        "strip_html": strip_html,
                        "wave_tmp": wave_tmp,
                        "spill_rows": spill_rows,
                        "read_batch_rows": read_batch_rows,
                    },
                    batch_format="pyarrow",
                    batch_size=None,
                    num_cpus=1,
                )
                .to_pandas()  # one tiny stats row per partition
            )
            stage_times["partition_build"] = stage_times.get(
                "partition_build", 0.0
            ) + round(time.monotonic() - wave_t0, 3)
            by_pid = {int(r.partition_id): r for r in stats_tbl.itertuples()}
            manifest = {
                "partitions": wave_pids,
                "wall_s": round(time.monotonic() - wave_t0, 3),
                "per_partition": {
                    str(p): {
                        "files": part_files[p],
                        "n_docs": int(by_pid[p].n_docs) if p in by_pid else 0,
                        "n_tokens": int(by_pid[p].n_tokens) if p in by_pid else 0,
                        "n_terms": int(by_pid[p].n_terms) if p in by_pid else 0,
                        "n_postings": int(by_pid[p].n_postings) if p in by_pid else 0,
                        "n_flushes": int(by_pid[p].n_flushes) if p in by_pid else 0,
                        "build_s": float(by_pid[p].wall_s) if p in by_pid else 0.0,
                    }
                    for p in wave_pids
                },
            }
            _atomic_write_json(os.path.join(wave_tmp, "manifest.json"), manifest)
            final = os.path.join(out_dir, "waves", wave_name)
            shutil.rmtree(final, ignore_errors=True)
            os.replace(wave_tmp, final)
            continue

        ds = rd.read_parquet(
            wave_files,
            columns=["conv_id", "turn_idx", "text"],
            include_paths=True,
        )
        tok_kwargs = {
            "offsets_ref": offsets_ref,
            "path2pid": path2pid,
            "mode": mode,
            "buckets": buckets,
            "strip_html": strip_html,
        }
        if use_actor_pool:
            exploded = ds.map_batches(
                TokenizerActor,
                fn_constructor_kwargs=tok_kwargs,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=batch_size,
                # start near-full: an autoscaling ramp from 1 actor wastes
                # most of the wave on a cold pool at high CPU counts
                concurrency=(max(2, ncpu - 2), max(2, ncpu)),
                num_cpus=1,
            ).materialize()
        else:
            # default: task-based with per-worker cached state (same
            # load-once-per-worker semantics, no pool-startup tail)
            exploded = ds.map_batches(
                tokenize_batch,
                fn_kwargs=tok_kwargs,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=batch_size,
                num_cpus=1,
            ).materialize()
        t_tok = time.monotonic()
        stage_times["tokenize"] = stage_times.get("tokenize", 0.0) + round(
            t_tok - wave_t0, 3
        )

        doclens = exploded.map_batches(
            lambda t, b=buckets: (
                t.filter(pc.less(t["gkey"], 0))
                .select(["doc_id", "tf", "gkey"])
                .rename_columns(["doc_id", "doc_len", "neg_pid"])
            ),
            batch_format="pyarrow",
        ).map_batches(
            lambda t: t.set_column(
                2,
                "partition_id",
                pc.cast(pc.subtract(-1, t["neg_pid"]), pa.int32()),
            ),
            batch_format="pyarrow",
        )
        doclens.write_parquet(os.path.join(wave_tmp, "doclens"))
        t_dl = time.monotonic()
        stage_times["doclens_write"] = stage_times.get("doclens_write", 0.0) + round(
            t_dl - t_tok, 3
        )

        postings = exploded.map_batches(
            lambda t: t.filter(pc.greater_equal(t["gkey"], 0)),
            batch_format="pyarrow",
        )
        segments = postings.groupby("gkey").map_groups(
            lambda g, b=buckets: build_bucket_postings(g, b),
            batch_format="pyarrow",
        )
        segments.write_parquet(os.path.join(wave_tmp, "segments"))
        t_seg = time.monotonic()
        stage_times["postings_build"] = stage_times.get("postings_build", 0.0) + round(
            t_seg - t_dl, 3
        )

        # per-partition lineage/metrics from the written outputs (small
        # metadata columns only)
        import duckdb

        con = duckdb.connect()
        doc_stats = con.sql(
            f"SELECT partition_id, count(*) AS n_docs, sum(doc_len) AS n_tokens "
            f"FROM read_parquet('{wave_tmp}/doclens/*.parquet') GROUP BY 1"
        ).fetchall()
        seg_stats = con.sql(
            f"SELECT partition_id, count(*) AS n_terms, sum(df) AS n_postings "
            f"FROM read_parquet('{wave_tmp}/segments/*.parquet') GROUP BY 1"
        ).fetchall()
        con.close()
        doc_stats = {int(r[0]): r for r in doc_stats}
        seg_stats = {int(r[0]): r for r in seg_stats}
        stage_times["wave_stats"] = stage_times.get("wave_stats", 0.0) + round(
            time.monotonic() - t_seg, 3
        )
        manifest = {
            "partitions": wave_pids,
            "wall_s": round(time.monotonic() - wave_t0, 3),
            "per_partition": {
                str(p): {
                    "files": part_files[p],
                    "n_docs": int(doc_stats[p][1]) if p in doc_stats else 0,
                    "n_tokens": int(doc_stats[p][2]) if p in doc_stats else 0,
                    "n_terms": int(seg_stats[p][1]) if p in seg_stats else 0,
                    "n_postings": int(seg_stats[p][2]) if p in seg_stats else 0,
                }
                for p in wave_pids
            },
        }
        _atomic_write_json(os.path.join(wave_tmp, "manifest.json"), manifest)
        final = os.path.join(out_dir, "waves", wave_name)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(wave_tmp, final)

    # ---- merge (idempotent; skipped when up to date) ----
    committed, waves = _committed_partitions(out_dir)
    if len(committed) != n_partitions:
        raise RuntimeError(
            f"{n_partitions - len(committed)} partitions failed to commit"
        )
    merged_dir = os.path.join(out_dir, "merged")
    meta_path = os.path.join(merged_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("waves") == waves:
            return meta
    # merge checkpoint: keep a partially-completed _tmp_merged (its
    # bucket files are atomic) when it was built from the SAME wave
    # set; run_merge then skips finished buckets
    merged_tmp = os.path.join(out_dir, "_tmp_merged")
    merge_ckpt = os.path.join(merged_tmp, "merge_inputs.json")
    keep = False
    if os.path.exists(merge_ckpt):
        with open(merge_ckpt) as f:
            keep = json.load(f).get("waves") == waves
    if not keep:
        shutil.rmtree(merged_tmp, ignore_errors=True)
        os.makedirs(os.path.join(merged_tmp, "postings"))
        os.makedirs(os.path.join(merged_tmp, "lexparts"))
        os.makedirs(os.path.join(merged_tmp, "termlocs"))
        os.makedirs(os.path.join(merged_tmp, "convlex"))
        _atomic_write_json(merge_ckpt, {"waves": waves})
    else:
        os.makedirs(os.path.join(merged_tmp, "termlocs"), exist_ok=True)
        os.makedirs(os.path.join(merged_tmp, "convlex"), exist_ok=True)

    seg_files = sorted(
        glob.glob(os.path.join(out_dir, "waves", "*", "segments", "*.parquet"))
    )
    t_m0 = time.monotonic()
    run_merge(
        seg_files,
        os.path.join(merged_tmp, "postings"),
        buckets,
        lex_dir=os.path.join(merged_tmp, "lexparts"),
        max_chunk=max_chunk,
        loc_dir=os.path.join(merged_tmp, "termlocs"),
        convlex_dir=os.path.join(merged_tmp, "convlex"),
        conv_starts=offsets["offset"].to_numpy(),
    )
    stage_times["merge"] = round(time.monotonic() - t_m0, 3)

    # global lexicon = sorted concat of the per-bucket slices the merge
    # tasks already aggregated (buckets partition the term space; no
    # scan over the merged postings is needed)
    lex_parts = sorted(glob.glob(os.path.join(merged_tmp, "lexparts", "*.parquet")))
    if lex_parts:
        lex = pa.concat_tables(pq.read_table(p) for p in lex_parts).sort_by("term")
    else:
        lex = pa.table(
            {
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "cf": pa.array([], pa.int64()),
                "n_chunks": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
            }
        )
    _atomic_write_table(lex, os.path.join(merged_tmp, "lexicon.parquet"))
    totals = (
        int(pc.sum(lex["cf"]).as_py() or 0),
        lex.num_rows,
    )
    stage_times["lexicon"] = round(time.monotonic() - t_m0 - stage_times["merge"], 3)
    meta = {
        "n_docs": n_docs,
        "total_tokens": int(totals[0]),
        "n_terms": int(totals[1]),
        "avg_doc_len": (int(totals[0]) / n_docs) if n_docs else 0.0,
        "mode": mode,
        "buckets": buckets,
        "n_partitions": n_partitions,
        "waves": waves,
        "conv_lemmas": True,
        "build_wall_s": round(time.monotonic() - t_start, 3),
        "stage_times": stage_times,
    }
    _atomic_write_json(os.path.join(merged_tmp, "meta.json"), meta)
    shutil.rmtree(merged_dir, ignore_errors=True)
    os.replace(merged_tmp, merged_dir)
    return meta
