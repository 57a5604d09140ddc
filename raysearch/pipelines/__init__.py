"""Training-data pipeline operators beyond the reference's own surface.

These are the large-scale data-processing stages a 100 TB training-data
pipeline needs around the core index engine: deduplication families
and duplicate clustering (dedup.py), similarity search over embeddings
(simsearch.py), text analysis / quality filtering / redaction
(textstats.py), sampling and windowed ranking (sampling.py), sequence
packing (packing.py), feature extraction (features.py),
conversation-level curation over the transcript shape's role/tool/ts
columns (convstats.py), dataset
profiling (profile.py), cardinality / frequency / membership /
heavy-hitter sketches (sketch.py), the composed curation flagship
(curation.py), multimodal binary-column plumbing (multimodal.py),
the resumable partitioned output sink (sink.py), and generic
relational aggregates/joins/windows (relational.py).  All are
Ray-Data-first: vectorized map_batches over Arrow batches, partial
aggregation before shuffles, broadcast small sides via ray.put.
"""
