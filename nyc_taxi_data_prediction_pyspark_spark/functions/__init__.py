"""Scalar / vector helper functions (SURVEY.md §2.7, §2.10).

Everything here is built-in-expression composition — JVM-side,
codegen'd, no Python in the row path.
"""
