"""Structured Streaming jobs (SURVEY.md §2.10, entry point B)."""
