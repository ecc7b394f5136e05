"""Operator tier.

``corpus``      — the reference's SQL query corpus (sql/sample_athena_queries.sql,
                  README.md, test_pipeline.py) re-expressed as DataFrame builders
                  over the driver's synthetic tables.
``analytics``   — join/window/top-k analytics the TPC-H-shaped bench requires.
``dedup``       — exact + near-duplicate detection (MinHash LSH, SimHash, n-gram
                  Jaccard) over ``documents``.
``similarity``  — vector similarity search over ``embeddings`` (brute-force
                  cosine top-k baseline; LSH-bucketed scale path).
``text``        — language-ID, quality scoring, token counting, fingerprinting.
``multimodal``  — binary-column plumbing with stubbed decoders.
"""
