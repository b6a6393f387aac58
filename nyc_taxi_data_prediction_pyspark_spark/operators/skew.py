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


def skew_report(
    frames: Sequence[tuple[str, DataFrame, str]],
    *,
    parallelism: int = 1000,
) -> DataFrame:
    """Key-skew advisor — measures the thing this module's mitigations
    (salted_agg/salted_join) exist for, so a pipeline can DECIDE from
    data whether a key needs salting before the 100 TB run.

    For each ``(name, df, key_col)``: n_rows, n_keys, max_cnt (hottest
    key's row count), the hottest key itself (deterministic argmax:
    max count, then min key string), skew_ratio = max_cnt/avg_cnt
    (= max_cnt*n_keys/n_rows, ONE rounded division), and salt_buckets
    — the smallest salt fan-out that caps the hottest key's per-task
    share at an even 1/parallelism of the data:
    ceil(max_cnt * parallelism / n_rows) as exact BIGINT ceil division
    (`div`, never a truncated double), floored at 1 ("don't salt").

    Shape per frame: one map-side-combinable key count (the partial
    agg IS the skew-proof path even when the key is hot — combiners
    bound any task's state by its input split), one 1-row reduce over
    the counts frame; the k summaries union.
    """
    outs = []
    for name, df, key in frames:
        counts = df.groupBy(F.col(key).cast("string").alias("__k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("__c")
        )
        summary = counts.agg(
            F.sum("__c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("__c").cast("bigint").alias("max_cnt"),
            F.min_by(
                "__k", F.struct((-F.col("__c")).alias("nc"), F.col("__k").alias("k"))
            ).alias("top_key"),
        )
        outs.append(
            summary.select(
                F.lit(name).alias("keyed"),
                "n_rows",
                "n_keys",
                "max_cnt",
                "top_key",
                F.round(
                    F.col("max_cnt").cast("double")
                    * F.col("n_keys").cast("double")
                    / F.col("n_rows").cast("double"),
                    6,
                ).alias("skew_ratio"),
                F.greatest(
                    F.lit(1).cast("bigint"),
                    F.expr(
                        f"(max_cnt * {int(parallelism)} + n_rows - 1) div n_rows"
                    ).cast("bigint"),
                ).alias("salt_buckets"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("keyed")
