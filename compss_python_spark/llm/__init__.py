"""Large-scale training-data-pipeline operators (driver-mandated extension
surface beyond the reference: BASELINE.json north_star).

Modules: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity (brute-force + LSH ANN), text (language-ID, quality,
token counts, fingerprints), multimodal (binary columns + featurizer
plumbing).
"""
