"""Spark DataFrame operators (extraction, linking, canonicalization,
dedup, similarity, text analysis, serialization)."""
