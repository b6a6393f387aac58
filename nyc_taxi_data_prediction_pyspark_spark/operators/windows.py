"""Window functions (SURVEY.md §2.8).

The reference has no OVER clauses; its nearest relatives are the
top-k sort (readme.md:178-187) and the declared per-(hour, zone)
demand/delay analysis (readme.md:136-137). Ranking and lag-based
delay metrics are pure Spark built-ins — one sort-shuffle on the
partition key, whole-stage-codegen'd.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def top_per_group(
    df: DataFrame, *, partition: Sequence[str], order: Sequence[Column], k: int = 1
) -> DataFrame:
    """Top-k rows per group via row_number. Pass a deterministic
    tie-breaker as the last order expression."""
    w = W.partitionBy(*partition).orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def running_sum(
    df: DataFrame,
    *,
    partition: Sequence[str],
    order: Sequence[str],
    value: str,
    out_col: str = "running",
    exact_decimal_scale: int | None = 4,
) -> DataFrame:
    """Cumulative sum per group (rowsBetween unbounded-preceding → current).

    For double measures, summing via decimal keeps every prefix exact
    and engine-independent (same rationale as aggregates.dsum)."""
    w = (
        W.partitionBy(*partition)
        .orderBy(*[F.col(c).asc() for c in order])
        .rowsBetween(W.unboundedPreceding, 0)
    )
    v = F.col(value)
    if exact_decimal_scale is not None:
        expr = F.sum(v.cast(f"decimal(18,{exact_decimal_scale})")).over(w).cast("double")
    else:
        expr = F.sum(v).over(w)
    return df.withColumn(out_col, expr)


def sessionize(
    df: DataFrame,
    *,
    partition: Sequence[str],
    ts: str,
    gap: str = "30 minutes",
    order_tiebreak: Sequence[str] = (),
    out_col: str = "session_id",
) -> DataFrame:
    """Sessionization: a new session starts when the gap to the
    previous row exceeds ``gap``. Classic two-window composition —
    lag → boundary flag → cumulative sum — one sort-shuffle total
    (both windows share partitioning+ordering, so Catalyst runs them
    in a single Window exec)."""
    order = [F.col(ts).asc(), *[F.col(c).asc() for c in order_tiebreak]]
    w = W.partitionBy(*partition).orderBy(*order)
    prev = F.lag(F.col(ts)).over(w)
    boundary = F.when(
        prev.isNull() | (F.col(ts) > prev + F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    cum = W.partitionBy(*partition).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    return df.withColumn(out_col, F.sum(boundary).over(cum))


def lag_gap_seconds(
    df: DataFrame, *, partition: Sequence[str], ts: str, order_tiebreak: Sequence[str] = ()
) -> DataFrame:
    """Delay metric: microsecond-exact gap to the previous row per
    group (lag). Gap is BIGINT micros → exact in any summation order,
    so downstream averages are oracle-stable."""
    w = W.partitionBy(*partition).orderBy(F.col(ts).asc(), *[F.col(c).asc() for c in order_tiebreak])
    prev = F.lag(F.col(ts)).over(w)
    return df.withColumn(
        "gap_us", (F.unix_micros(F.col(ts)) - F.unix_micros(prev)).cast("bigint")
    )
