"""Extension operators beyond the reference's surface (SURVEY.md §7.1
M5; BASELINE.json north star): the operations a large-scale
training-data pipeline needs — deduplication, similarity search, text
analytics, JSON scalar ops, multimodal column plumbing.

Design rules shared by every operator here:
- declarative DataFrame plans (Catalyst owns the physical strategy);
- any hash used for bucketing/signatures is derived from md5 so the
  DuckDB oracle reproduces it bit-for-bit (ext.hashing);
- candidate generation before pairwise work (LSH bands, simhash bytes,
  shingle inverted index) so nothing is O(n²) at scale;
- Python only where Spark genuinely lacks the primitive (multimodal
  decode via mapInPandas — Arrow-batched, never per-row).
"""
