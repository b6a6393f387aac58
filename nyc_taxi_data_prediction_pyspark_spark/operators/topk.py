"""Sorts / limits / top-k (SURVEY.md §2.5 O1-O3).

The reference's inspection queries: global LIMIT sampling
(reference: dags/etl_spark_historical.py:195), ``SELECT * LIMIT n``
(readme.md:156-158) and ``ORDER BY LOAD_TS DESC LIMIT k``
(readme.md:178-187).

Physical note: ``orderBy(...).limit(k)`` compiles to Catalyst's
``TakeOrderedAndProject`` — per-partition heap of size k + driver
merge, NO global sort/shuffle. That is exactly the plan we want at
100 TB (k rows cross the wire per partition, not the table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """O3: top-k by sort. Pass a deterministic tie-breaker (e.g. a key
    column) as the last order expression — plain ``LIMIT`` without a
    total order is nondeterministic row selection (same caveat as the
    reference's limit, SURVEY.md §4)."""
    return df.orderBy(*order).limit(k)


def sample_rows(df: DataFrame, n: int) -> DataFrame:
    """O1/O2: un-ordered inspection sample (reference semantics:
    nondeterministic). For oracle-checked paths use ``top_k``."""
    return df.limit(n)
