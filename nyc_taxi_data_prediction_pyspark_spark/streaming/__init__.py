"""Structured Streaming variants (SURVEY.md §2.9 T1-T6)."""
