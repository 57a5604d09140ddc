"""Training-data pipeline operators beyond the reference's own surface.

These are the large-scale data-processing stages a 100 TB training-data
pipeline needs around the core index engine: deduplication families
(dedup.py), similarity search over embeddings (simsearch.py), text
analysis (textstats.py), multimodal binary-column plumbing
(multimodal.py), and generic relational aggregates/joins
(relational.py).  All are Ray-Data-first: vectorized map_batches over
Arrow batches, partial aggregation before shuffles, broadcast small
sides via ray.put.
"""
