"""Set operations (SURVEY.md §2.6).

None exist in the reference; they're free Spark built-ins and the
MERGE+TRUNCATE cycle implies union semantics internally
(reference: dags/etl_spark_historical.py:303-337). Exposed as thin,
named wrappers so the entry-point inventory lists them explicitly.

All three are shuffles on the full row; at scale prefer key-column
projections first (distinct on narrow keys, then semi-join back).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_all_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.subtract(b)
