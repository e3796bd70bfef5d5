"""Incremental ingest (Structured Streaming, availableNow)."""
