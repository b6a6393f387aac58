"""Operator inventory (SURVEY.md §2).

Reference-parity relational operators plus the LLM-data-pipeline set
(dedup, similarity search, text analysis, multimodal). Each module
documents which §2 rows it covers and cites the reference lines it
re-expresses.
"""
