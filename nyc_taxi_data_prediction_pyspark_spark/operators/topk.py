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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


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


def grouped_top_k(
    df: DataFrame,
    group_cols: Sequence[str],
    k: int,
    order: Sequence[Column],
    *,
    out_col: str = "rank_in_group",
    two_phase: bool = True,
    salt_buckets: int = 64,
) -> DataFrame:
    """Top-k rows WITHIN each group without funnelling any group through
    a single task — the salted two-phase form of
    ``row_number() OVER (PARTITION BY group ORDER BY ...) <= k``.

    The plain window hashes on the group key alone, so a hot group (one
    event type that is half the feed) is sorted by ONE task holding the
    whole group. Here instead:

      1. salt every row with ``spark_partition_id() % salt_buckets`` —
         any assignment is correct (the true top-k of a group is in the
         union of its per-salt top-ks), so the free, shuffle-less pid
         works; the phase-1 exchange hashes on (salt, group), spreading
         a hot group over up to ``salt_buckets`` tasks;
      2. local row_number per (salt, group), keep rank <= k — at most
         k × salt_buckets survivors per group, independent of group
         size;
      3. the exact window on the survivors only — the "hot group" is
         now bounded, so the single-task sort it implies is O(k·S),
         not O(|group|).

    ``order`` must be a total order (append a unique tie-break column)
    or row selection is nondeterministic — the same caveat as
    ``top_k``. With a total order the result is IDENTICAL to the plain
    window (``two_phase=False``, the small-N oracle cross-check);
    both phases are exact integer ranking, no approximation.
    """
    gcols = list(group_cols)
    ocols = list(order)
    if not two_phase:
        w = W.partitionBy(*gcols).orderBy(*ocols)
        return df.withColumn(out_col, F.row_number().over(w)).where(F.col(out_col) <= k)
    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    )
    w_local = W.partitionBy("__salt", *gcols).orderBy(*ocols)
    survivors = (
        salted.withColumn("__local_rn", F.row_number().over(w_local))
        .where(F.col("__local_rn") <= k)
        .drop("__salt", "__local_rn")
    )
    w_final = W.partitionBy(*gcols).orderBy(*ocols)
    return survivors.withColumn(out_col, F.row_number().over(w_final)).where(
        F.col(out_col) <= k
    )
