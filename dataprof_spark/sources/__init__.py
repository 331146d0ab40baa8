"""Sources & sinks: robust CSV/JSON readers, parquet metadata ops,
schema-versioned report sinks (reference S1-S12, SURVEY.md §2.1)."""
