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


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: "list[str]",
    compare_cols: "list[str]",
) -> DataFrame:
    """Keyed reconciliation of two table versions (the warehouse
    anti-entropy / CDC-backfill check): classify every key as
    ``added`` (right only), ``removed`` (left only), ``changed``
    (both, any compare column differs — NULL-safe), or ``unchanged``.

    One full-outer hash join on the key — the minimal shuffle for the
    semantics; comparisons are codegen'd eqNullSafe per column, so the
    cost class is the join itself. At 100 TB both sides hash on the
    same key and partition-prune first when versions share layout
    (diff month-by-month, the merge_upsert ``prune`` discipline).
    Returns key columns + change_type.
    """
    from pyspark.sql import functions as F

    lk = left.select(
        *[F.col(c).alias(f"__lk_{c}") for c in key_cols],
        *[F.col(c).alias(f"__lv_{c}") for c in compare_cols],
        F.lit(1).alias("__in_l"),
    )
    rk = right.select(
        *[F.col(c).alias(f"__rk_{c}") for c in key_cols],
        *[F.col(c).alias(f"__rv_{c}") for c in compare_cols],
        F.lit(1).alias("__in_r"),
    )
    cond = [F.col(f"__lk_{c}").eqNullSafe(F.col(f"__rk_{c}")) for c in key_cols]
    j = lk.join(rk, on=cond, how="full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__lv_{c}").eqNullSafe(F.col(f"__rv_{c}"))
    change = (
        F.when(F.col("__in_l").isNull(), F.lit("added"))
        .when(F.col("__in_r").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    keys = [
        F.coalesce(F.col(f"__lk_{c}"), F.col(f"__rk_{c}")).alias(c) for c in key_cols
    ]
    return j.select(*keys, change.alias("change_type"))
