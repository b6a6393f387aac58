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


def table_checksum(
    df: DataFrame,
    *,
    bucket_col: "str | None",
    cols: "list[str]",
    n_buckets: int = 64,
) -> DataFrame:
    """Order-invariant per-bucket content checksum — the anti-entropy
    primitive that lets two engines (or two replicas / two versions of
    a 100 TB table) agree on WHERE they differ by exchanging
    ``n_buckets`` rows instead of the table: buckets whose (row count,
    checksum) match need no further work; only mismatched buckets go
    through the row-level ``table_diff``.

    Each row is rendered to a canonical string (field-separated
    ``cols``), hashed with the engine-stable md5-60bit, and SUMMED per
    bucket as DECIMAL(38,0) — commutative/associative, so the result
    is independent of row order, partitioning, and merge tree shape,
    and exact (no i64 wraparound until 1e38). The final checksum is
    the sum mod 2^60, emitted as BIGINT.

    Canonicalization caveat: callers pick ``cols`` whose string
    rendering is engine-stable (ints, strings, dates). Doubles and
    decimals render differently across engines — normalize those
    upstream (e.g. cast to DECIMAL then to string with fixed scale)
    before handing them here.
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import md5_int60

    bucket = (
        (F.col(bucket_col) % n_buckets).alias("bucket")
        if bucket_col is not None
        else F.lit(0).alias("bucket")
    )
    row_str = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    hashed = df.select(bucket, md5_int60(row_str).alias("h"))
    two60 = F.lit(1 << 60).cast("decimal(38,0)")
    return (
        hashed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(F.col("h").cast("decimal(38,0)")) % two60)
            .cast("bigint")
            .alias("checksum"),
        )
    )
