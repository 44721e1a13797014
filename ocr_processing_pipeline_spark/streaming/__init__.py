"""Structured Streaming variants (incremental ingest, windowed aggs)."""
