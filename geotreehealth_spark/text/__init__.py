"""Training-data pipeline operators over document/embedding tables.

Beyond the reference's own operator inventory: deduplication (exact, word-
Jaccard, MinHash-LSH, SimHash), similarity search (brute-force cosine top-k +
LSH-bucketed scale path), and text analysis (language-ID heuristic, quality
scoring, token counting, fingerprinting) — the operations a 100 TB corpus
pipeline needs around the geospatial core.
"""
