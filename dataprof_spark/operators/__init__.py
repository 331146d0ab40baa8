"""Spark operators: profiling, quality gates, scrub, dedup, similarity,
sampling — the engine's operator inventory (SURVEY.md §2)."""
