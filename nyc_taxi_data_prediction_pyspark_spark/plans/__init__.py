"""Physical-plan introspection (SURVEY.md §4)."""
