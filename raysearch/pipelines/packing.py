"""Sequence-packing offsets — the GPT-style "concatenate every
document with a separator, slice the stream into fixed context-length
chunks" training-data step, reduced to its distributable core: an
EXACT global token prefix sum over docs in doc_id order.

``pack_offsets(ds, seq_len)`` emits, per document, its token count,
its global start offset in the concatenated token stream, and the
first/last context chunk it lands in.  A trainer shards chunk ranges;
a data loader uses (start_off, n_tokens) to locate any doc inside any
chunk without scanning.

Distribution (the conv-offset pattern from ``build.py:141`` made a
user-facing operator, two SMALL exchanges + one bucket-local pass):

1. bucket = doc_id // bucket_size (range buckets keep doc_id order
   across buckets by construction);
2. per-bucket token sums — one groupby over (bucket, n) partials
   (rows = buckets, not docs);
3. exclusive cumsum over the sorted bucket sums (driver-side: one int
   per bucket — millions of buckets per 10¹² docs, broadcast via
   ``ray.put``);
4. per-bucket ``map_groups``: sort the bucket's docs by doc_id, local
   exclusive cumsum + the bucket's base offset.

Token counts use the whitespace rule (``\\S+``) shared with
``textstats.token_counts`` so the SQL oracle replays it exactly with
``regexp_extract_all``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

WS_TOKEN_PATTERN = r"\S+"


def pack_offsets(ds, seq_len: int = 2048, *, bucket_size: int = 100_000):
    """Per-doc global token offsets + context-chunk spans.

    Output: ``(doc_id, n_tokens, start_off, chunk_first, chunk_last)``
    sorted by doc_id.  Empty docs get ``chunk_first == chunk_last ==
    start_off // seq_len`` (zero-width span)."""
    import ray
    from ray.data.aggregate import Sum

    def count_tokens(b: pa.Table) -> pa.Table:
        ids = pc.cast(b["doc_id"], pa.int64())
        n = pc.count_substring_regex(b["text"], pattern=WS_TOKEN_PATTERN)
        return pa.table(
            {
                "doc_id": ids,
                "bucket": pc.divide(ids, pa.scalar(bucket_size, pa.int64())),
                "n_tokens": pc.cast(n, pa.int64()),
            }
        )

    counted = ds.map_batches(count_tokens, batch_format="pyarrow").materialize()

    sums = counted.groupby("bucket").aggregate(Sum("n_tokens", alias_name="total"))
    sp = sums.to_pandas().sort_values("bucket")
    totals = sp.total.to_numpy(np.int64)
    # two flat int64 arrays (not a dict): 16 B/bucket broadcast
    bucket_ids = sp.bucket.to_numpy(np.int64)
    bases = np.cumsum(totals) - totals
    base_ref = ray.put((bucket_ids, bases))

    def bucket_offsets(g: pd.DataFrame) -> pd.DataFrame:
        bucket_ids, bases = ray.get(base_ref)
        g = g.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        n = g.n_tokens.to_numpy()
        pos = np.searchsorted(bucket_ids, int(g.bucket.iloc[0]))
        start = int(bases[pos]) + (np.cumsum(n) - n)
        last_tok = start + np.maximum(n, 1) - 1  # zero-width span for empty docs
        return pd.DataFrame(
            {
                "doc_id": g.doc_id,
                "n_tokens": n,
                "start_off": start,
                "chunk_first": start // seq_len,
                "chunk_last": last_tok // seq_len,
            }
        )

    return (
        counted.groupby("bucket")
        .map_groups(bucket_offsets, batch_format="pandas")
        .sort("doc_id")
    )
