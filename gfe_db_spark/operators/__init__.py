"""Large-scale training-data pipeline operators: deduplication, similarity
search, text analysis, multimodal column plumbing.

These extend the reference's surface (SURVEY.md north-star extensions) and
are designed for 100 TB: shuffle-minimal shapes, broadcast-able dims,
banded LSH instead of all-pairs wherever a threshold allows it.
"""
