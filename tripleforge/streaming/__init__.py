"""Structured-Streaming incremental ingest tier (SURVEY.md §2.D)."""
