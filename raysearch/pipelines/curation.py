"""Flagship corpus-curation pipeline — the operators of this package
composed end-to-end the way a training-data run would chain them:

    documents
      → quality_filter         (C4-style rules, streaming filter)
      → dup_clusters keep-set  (LSH pairs → connected components →
                                 keep cluster minima)
      → stratified_sample      (per-language data mixing, pure filter)
      → (doc_id, lang)         survivors

Each stage is the already-oracled operator; the composed pipeline is
itself exactly SQL-checkable because every stage's oracle composes
(the driver row ``curation_pipeline`` hash-checks the final survivor
set).  Stage-to-stage id handoff is the ``copartition_attach``
semi-join (hash merge, no join operator, no driver id sets).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from raysearch.pipelines.dedup import dup_clusters
from raysearch.pipelines.sampling import stratified_sample
from raysearch.pipelines.textstats import quality_filter
from raysearch.util import copartition_attach

DOCS_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string())]
)


def curation_pipeline(
    docs,
    rates: dict[str, float],
    *,
    min_tokens: int = 5,
    min_quality: float = 0.5,
    max_stop_ratio: float = 0.6,
    threshold: float = 0.6,
    shingle: int = 3,
):
    """``docs`` must carry (doc_id, text, lang).  Returns the sampled
    survivor set ``(doc_id, lang)`` sorted by doc_id."""

    def ids_only(b: pa.Table) -> pa.Table:
        return b.select(["doc_id"])

    def cast_docs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "text": b["text"],
                "lang": b["lang"],
            }
        )

    docs = docs.map_batches(cast_docs, batch_format="pyarrow")

    # 1. quality survivors (ids), attached back to full rows
    q_ids = quality_filter(
        docs,
        min_tokens=min_tokens,
        min_quality=min_quality,
        max_stop_ratio=max_stop_ratio,
    ).map_batches(ids_only, batch_format="pyarrow")
    docs_q = copartition_attach(docs, q_ids, "doc_id", DOCS_SCHEMA, {}, semi=True)

    # 2. near-dup clusters over the filtered corpus; keep cluster minima
    clusters = dup_clusters(
        docs_q.select_columns(["doc_id", "text"]), threshold=threshold, shingle=shingle
    )

    def keepers(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["doc_id"], b["cluster_id"])).select(["doc_id"])

    keep_ids = clusters.map_batches(keepers, batch_format="pyarrow")
    docs_kept = copartition_attach(
        docs_q, keep_ids, "doc_id", DOCS_SCHEMA, {}, semi=True
    )

    # 3. per-language mixing, then the survivor projection
    return (
        stratified_sample(
            docs_kept.select_columns(["doc_id", "lang"]), rates
        ).sort("doc_id")
    )
