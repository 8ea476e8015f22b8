"""Operator library: reusable DataFrame→DataFrame building blocks.

- ``relational``  — declarative node factories over the DataFrame API
- ``dedup``       — exact / MinHash-LSH / SimHash deduplication
- ``similarity``  — cosine ANN (brute-force + LSH-bucketed)
- ``multimodal``  — binary-column (image/audio/video) plumbing
"""
