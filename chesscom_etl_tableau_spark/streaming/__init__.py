"""Structured Streaming incremental ingest (SURVEY.md §2.7)."""
