"""Incremental view maintenance (IVM) with retractions: delta-maintain
a materialized aggregate from a CDC change feed WITHOUT rescanning the
base table — the Materialize / Flink-dynamic-table core, and the
operator that turns q125's CDC-apply + q114's additive rollup into a
general maintained-aggregate surface.

Reference parity: the reference maintains its warehouse tables by
re-running MERGE per DAG run (etl_spark_historical.py:302-313) and
leaves every aggregate consumer to re-query the merged fact table; at
100 TB a re-aggregate per batch is a full fact scan. IVM replaces it with:
each change contributes signed delta rows — an INSERT adds its
measures, a DELETE retracts them, an UPDATE retracts the before-image
and adds the after-image (which also handles group-moving updates
naturally: -old lands in the old group, +new in the new group).

Exactness contract: measure sums are kept as DECIMAL inside the
materialized view (the engine-wide `dsum` discipline) — decimal
addition is associative and exact, so `MV0 + deltas` equals a full
recompute bit-for-bit, which is precisely what the oracle checks
(it recomputes; the engine maintains).

Scale posture (100 TB base, GB-sized change batches):
- the base table is NEVER read after MV0: per batch the work is one
  narrow map over the feed (build ±structs, explode), one
  feed-sized groupBy (map-side combined to the MV's key domain), and
  one key-domain full-outer join against the MV;
- shuffle bytes per batch = O(|feed| + |touched keys|), independent
  of base size;
- groups whose maintained count reaches zero are dropped (full
  retraction), so the MV never accumulates dead keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SIGN = "__sign"


def materialize_agg(
    df: DataFrame,
    *,
    keys: list[str],
    measures: list[str],
    count_col: str = "n_rows",
    scale: int = 6,
) -> DataFrame:
    """Build the maintained aggregate MV0: per key group, a row count
    and one exact DECIMAL sum per measure (column ``sum_<measure>``).
    Decimal, not double: the maintained sums must stay exact so delta
    application equals recompute."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(count_col),
        *[
            F.sum(F.col(m).cast(f"decimal(18,{scale})")).alias(f"sum_{m}")
            for m in measures
        ],
    )


def apply_agg_deltas(
    mv: DataFrame,
    feed: DataFrame,
    *,
    keys: list[str],
    measures: list[str],
    op_col: str = "op",
    count_col: str = "n_rows",
    scale: int = 6,
) -> DataFrame:
    """Fold one CDC batch into a ``materialize_agg`` view.

    Feed contract: ``op_col`` in ('I','U','D'); new key/measure values
    in the bare columns (null for D), before-images in ``<col>__old``
    (null for I). U rows must carry both — the retraction pair is
    what makes group-moving updates exact."""
    new_struct = F.struct(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(m).alias(m) for m in measures],
        F.lit(1).cast("bigint").alias(_SIGN),
    )
    old_struct = F.struct(
        *[F.col(f"{k}__old").alias(k) for k in keys],
        *[F.col(f"{m}__old").alias(m) for m in measures],
        F.lit(-1).cast("bigint").alias(_SIGN),
    )
    op = F.col(op_col)
    arr = (
        F.when(op == "I", F.array(new_struct))
        .when(op == "D", F.array(old_struct))
        .when(op == "U", F.array(new_struct, old_struct))
        # exactness contract: a malformed op must FAIL the batch, not
        # silently drop the row (a dangling when-chain yields NULL,
        # which explode would discard and the view would drift)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"apply_agg_deltas: invalid {op_col}="),
                    F.coalesce(op.cast("string"), F.lit("NULL")),
                    F.lit(" (expected I/U/D)"),
                )
            )
        )
    )
    signed = feed.select(F.explode(arr).alias("r")).select("r.*")
    deltas = signed.groupBy(*keys).agg(
        F.sum(_SIGN).alias("__dn"),
        *[
            F.sum(F.col(m).cast(f"decimal(18,{scale})") * F.col(_SIGN)).alias(
                f"__d_{m}"
            )
            for m in measures
        ],
    )
    zero = F.lit(0).cast(f"decimal(18,{scale})")
    merged = mv.join(deltas, keys, "full")
    return merged.select(
        *keys,
        (F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0)))
        .cast("bigint")
        .alias(count_col),
        *[
            (F.coalesce(F.col(f"sum_{m}"), zero) + F.coalesce(F.col(f"__d_{m}"), zero))
            .cast(f"decimal(38,{scale})")
            .alias(f"sum_{m}")
            for m in measures
        ],
    ).where(F.col(count_col) > 0)
