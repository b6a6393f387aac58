"""MLlib pipelines (SURVEY.md §2.10 M1-M2)."""
