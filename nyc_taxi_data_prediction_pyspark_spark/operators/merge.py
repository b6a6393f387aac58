"""Idempotent upsert MERGE (SURVEY.md §2.3 J1) + staging lifecycle
(§2.1 S7-S12).

The reference's signature load semantics: MERGE staging→fact on a
6-column composite key, INSERT only unmatched rows, no UPDATE branch
(reference: dags/etl_spark_historical.py:303-333), then TRUNCATE the
staging table (:336-337). Semantically an **anti-semi-join**, so the
Spark-native form is ``left_anti`` + append — Catalyst/AQE picks
broadcast vs shuffle at runtime.

Preserved quirks (SURVEY.md §2.3, judged for parity):
- two FLOAT key columns compared by equality (:310-311) — no rounding;
- ``passenger_count`` NOT in the key (:306-311): rows differing only
  there collapse to one on load;
- SQL ``NULL = NULL`` is falsy: NULL-keyed staging rows always insert.
  Spark's ``left_anti`` has identical NULL semantics — kept as-is.

Scale: the fact side of the anti-join is huge, the staging batch is
small → broadcast the *staging* side by rewriting as fact-side
``left_anti``? No — the anti-join probes fact FOR staging rows, so we
join ``stg left_anti fact`` and Catalyst shuffles on the key. For
100 TB facts, partition the fact table by a key prefix (e.g. month of
pickup_datetime) and pre-filter fact to the staging batch's key range
before the join (partition pruning turns the probe into a few
partitions). ``merge_upsert`` takes an optional ``prune`` predicate
for exactly that.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def anti_new_rows(stg: DataFrame, fact: DataFrame, key: Sequence[str]) -> DataFrame:
    """Staging rows with no key-match in fact (the MERGE's NOT MATCHED
    branch, etl_spark_historical.py:322-333)."""
    return stg.join(fact.select(*key), on=list(key), how="left_anti")


def merge_upsert(
    stg: DataFrame,
    fact: DataFrame,
    key: Sequence[str],
    *,
    prune: Column | None = None,
) -> DataFrame:
    """fact ∪ (stg ⟕̸ fact): insert-if-not-matched merge as a DataFrame.

    ``prune``: optional fact-side partition predicate covering the
    staging batch's key range — at scale this is the difference between
    probing 3 partitions and probing the whole fact table. Rows outside
    ``prune`` are unioned back untouched.

    The fact table owns the schema: fact-only columns (e.g. a
    ``load_ts`` audit column) are preserved and NULL-filled on the
    inserted rows; staging columns absent from fact are an error (the
    reference's MERGE would reject them too).
    """
    extra = [c for c in stg.columns if c not in fact.columns]
    if extra:
        raise ValueError(f"staging columns not in fact table: {extra}")
    if prune is not None:
        fact_probe = fact.filter(prune)
    else:
        fact_probe = fact
    new_rows = anti_new_rows(stg, fact_probe, key)
    return fact.unionByName(new_rows, allowMissingColumns=True)


TRIP_MERGE_KEY = (
    "pickup_datetime",
    "dropoff_datetime",
    "pickup_zone_id",
    "dropoff_zone_id",
    "trip_distance",
    "total_amount",
)


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    *,
    key: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    upsert_op: str = "U",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a change-data-capture feed to a snapshot: latest-op-wins
    per key, honoring deletes — the missing D of the MERGE family
    (J1 upserts only; SCD2 versions; this one REPLAYS a change log).

    Semantics: for each key, order its change rows by ``seq_col`` and
    keep only the LAST; if that op is ``delete_op`` the key disappears,
    if ``upsert_op`` the change row's values replace (or insert) the
    base row. Base rows with no changes pass through untouched.

    Plan: one window over the (small) change feed to pick last-ops —
    partitioned by key, so state is per-key rows-in-feed, never the
    base table — then ONE full-shuffle-free pass over base: left_anti
    against touched keys (drops both deleted and superseded rows) plus
    a union of the upsert rows. The base table is scanned once and
    never windowed. At 100 TB: same discipline as merge_upsert — the
    feed is batch-sized, base co-partitions on key, and a partition-
    pruning predicate derived from the feed's key range keeps the
    anti-join probe narrow.

    Determinism: ties on (key, seq) are broken by preferring the
    delete (a replayed feed cannot flap) — callers with genuinely
    concurrent same-seq writes must disambiguate upstream.
    """
    from pyspark.sql import Window

    keyl = list(key)
    w = Window.partitionBy(*keyl).orderBy(
        F.col(seq_col).desc(),
        # tie-break: delete sorts first so it wins over a same-seq upsert
        F.when(F.col(op_col) == delete_op, F.lit(0)).otherwise(F.lit(1)).asc(),
    )
    last = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    touched = last.select(*keyl)
    survivors = base.join(touched, keyl, "left_anti")
    upserts = last.where(F.col(op_col) == upsert_op).drop(op_col, seq_col)
    return survivors.unionByName(upserts)
