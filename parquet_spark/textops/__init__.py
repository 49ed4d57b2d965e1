"""Training-data pipeline operators over web-scale text/embedding tables:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text analysis
(language id, quality scores, token counts, fingerprints), and multimodal
binary-column plumbing.

All hashing uses md5 (identical in Spark and DuckDB) so every operator is
oracle-checkable cross-engine; xxhash64 is reserved for partition placement
where cross-engine parity isn't needed.
"""
