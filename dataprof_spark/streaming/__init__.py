"""Structured Streaming operators: windowed event aggregation with
watermarks, streaming quality gates, stateful sessionization."""
