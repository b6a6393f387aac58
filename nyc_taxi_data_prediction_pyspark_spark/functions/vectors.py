"""Vector math over ``array<float>`` embedding columns (SURVEY.md
§2.10 M3) as built-in higher-order functions — JVM-side, no UDF.

Determinism: elements are cast to double *before* any arithmetic and
folds run left-to-right (``F.aggregate`` semantics), so results are
bit-reproducible across cluster sizes and match a sequential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + left fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    diff = F.zip_with(a, b, lambda x, y: x - y)
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))
