"""Reusable operator library for the LLM-data-pipeline surface.

dedup.py       exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
similarity.py  cosine top-k (brute force) + LSH-bucketed ANN
text.py        tokenization, language-ID, quality scoring, fingerprinting
multimodal.py  binary-column plumbing + feature extraction (decode stubbed)
"""
