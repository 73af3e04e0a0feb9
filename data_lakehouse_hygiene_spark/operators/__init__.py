"""Operator inventory (SURVEY.md §2), re-expressed as Spark DataFrame ops.

Modules:
- ``cleaning``   — P1-P7 projection/coercion/null-filter operators.
- ``joins``      — J1-J4 broadcast dim joins + scalar-subquery windows.
- ``aggregates`` — A1-A11 plain/conditional/time-bucketed aggregations.
- ``ordering``   — O1-O3 sorts, top-1, limits.
- ``scoring``    — A8-A10 hygiene-score engine + CASE classification.
- ``json_ops``   — P6 nested-JSON flattening.
- ``dedup``      — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup.
- ``similarity`` — embedding cosine top-k (brute force + LSH-bucketed ANN).
- ``text``       — language-ID, quality scoring, token counting, fingerprints.
- ``multimodal`` — binary-column plumbing with stubbed decoders.
"""
