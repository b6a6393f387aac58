"""Skew mitigation (100 TB posture, SURVEY.md §7.4).

Two complementary mechanisms:

- **AQE skew-join splitting** — on by default in our session
  (`spark.sql.adaptive.skewJoin.enabled`): oversized shuffle
  partitions are split at runtime. Zero code, first line of defense.
- **Salting** — for the cases AQE can't fix (skewed *aggregation*
  keys, or joins where one hot key dwarfs a partition even after
  splitting): append a random salt ∈ [0, buckets) to the hot side's
  key, replicate the other side once per salt value, join/aggregate on
  (key, salt), then reduce away the salt.

``salted_agg`` demonstrates the two-phase aggregate; ``salted_join``
the replicate-and-join. Both are pure DataFrame composition and keep
partial aggregation / AQE in play.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Uniform int salt per row. `rand` is seeded per-task by Spark —
    deterministic plans don't need salt determinism, only uniformity."""
    return df.withColumn(col_name, (F.rand(seed=42) * buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    *,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation: partial agg on (keys, salt) —
    the hot key spreads over ``buckets`` partitions — then final agg
    on keys. Only works for algebraic aggregates (sum/count/min/max);
    the caller provides the partial expressions and the final merge is
    sum/min/max of partials by construction.

    ``aggs`` maps output name → partial aggregate expression; partials
    are re-merged with SUM for count/sum, MIN/MAX pass through their
    own function (detected from the alias prefix: min_*/max_*).
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )
    finals = []
    for name in aggs:
        p = F.col(f"__p_{name}")
        if name.startswith("min_"):
            finals.append(F.min(p).alias(name))
        elif name.startswith("max_"):
            finals.append(F.max(p).alias(name))
        else:
            finals.append(F.sum(p).alias(name))
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    *,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Replicated-salt equi-join: the skewed side gets a random salt,
    the other side is exploded ×buckets so every (key, salt) pair can
    meet. Join width grows by buckets on the small side only — use for
    hot-key joins where the non-skewed side is modest (dims).

    Only ``inner`` and ``left`` (skewed side preserved) are valid:
    right/full-outer would emit each unmatched replicated row once per
    salt — ``buckets`` duplicates of every unmatched dim row."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, not {how!r}")
    on = list(on)
    s = with_salt(skewed, buckets)
    o = other.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    out = s.join(o, on=[*on, "__salt"], how=how)
    return out.drop("__salt")
