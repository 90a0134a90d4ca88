"""Operators: profiling aggregates, dedup, similarity search, text stats."""
