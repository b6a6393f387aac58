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

from pyspark.sql import Column, DataFrame


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
