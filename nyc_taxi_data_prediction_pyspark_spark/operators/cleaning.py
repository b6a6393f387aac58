"""Cleaning contract: project + rename + cast + null-drop + predicate
filters + sample cap (SURVEY.md §2.2 P1-P4, §2.5 O1).

Re-expresses the reference's core transform
(reference: dags/etl_spark_historical.py:182-195):

    select 7 of ~19 columns with aliases  → P1
    cast ids→int, measures→double        → P2
    dropna on 4 key columns              → P3
    two NULL-rejecting > 0 filters       → P4
    limit(200_000) sampling cap          → O1

All steps are single-pass Catalyst expressions: the select/cast/filter
chain collapses into the Parquet scan (column pruning + predicate
pushdown), so at 100 TB this is one scan stage with no shuffle. The
200k cap is a *sample knob*, not a hard cap — pass ``cap=None`` for
full-scale runs (the reference's constant exists only to fit its
single-node CSV hop, which we do not reproduce).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def clean_contract(
    df: DataFrame,
    *,
    columns: Mapping[str, Column],
    required: Sequence[str] = (),
    positive: Sequence[str] = (),
    cap: int | None = None,
) -> DataFrame:
    """Generic select/rename/cast → dropna → positive-filter → cap.

    ``columns`` maps output name → input expression (the projection is
    explicit, so Catalyst prunes the scan to exactly these columns).
    ``required`` columns get the reference's dropna-subset semantics
    (etl_spark_historical.py:191); ``positive`` get the NULL-rejecting
    ``> 0`` comparison filters (:192-193).
    """
    out = df.select(*[expr.alias(name) for name, expr in columns.items()])
    if required:
        out = out.dropna(subset=list(required))
    for c in positive:
        out = out.filter(F.col(c) > 0)
    if cap is not None:
        # Plain limit: nondeterministic row choice, same as the
        # reference (etl_spark_historical.py:195). Ordered/seeded
        # variants for testability live in the caller.
        out = out.limit(cap)
    return out


def clean_trips(df: DataFrame, cap: int | None = 200_000) -> DataFrame:
    """The reference transform verbatim-in-capability, for real TLC
    parquet input (etl_spark_historical.py:182-195)."""
    return clean_contract(
        df,
        columns={
            "pickup_datetime": F.col("tpep_pickup_datetime"),
            "dropoff_datetime": F.col("tpep_dropoff_datetime"),
            "pickup_zone_id": F.col("PULocationID").cast("int"),
            "dropoff_zone_id": F.col("DOLocationID").cast("int"),
            "passenger_count": F.col("passenger_count").cast("int"),
            "trip_distance": F.col("trip_distance").cast("double"),
            "total_amount": F.col("total_amount").cast("double"),
        },
        required=["pickup_datetime", "dropoff_datetime", "pickup_zone_id", "dropoff_zone_id"],
        positive=["trip_distance", "total_amount"],
        cap=cap,
    )


def clean_lineitem_as_trips(df: DataFrame) -> DataFrame:
    """The same contract exercised on the driver's ``lineitem`` fixture
    (FIXTURES.md §B mapping: l_shipdate↔pickup ts, int keys↔zone ids,
    positive doubles↔distance/amount). No cap → deterministic, oracle-checkable.
    """
    return clean_contract(
        df,
        columns={
            "ship_date": F.col("l_shipdate"),
            "order_key": F.col("l_orderkey"),
            "part_zone_id": F.col("l_partkey").cast("int"),
            "supp_zone_id": F.col("l_suppkey").cast("int"),
            "line_number": F.col("l_linenumber").cast("int"),
            "quantity": F.col("l_quantity").cast("double"),
            "extended_price": F.col("l_extendedprice").cast("double"),
        },
        required=["ship_date", "order_key", "part_zone_id", "supp_zone_id"],
        positive=["quantity", "extended_price"],
        cap=None,
    )


CLEAN_LINEITEM_ORACLE = """
SELECT
  l_shipdate                 AS ship_date,
  l_orderkey                 AS order_key,
  CAST(l_partkey AS INTEGER) AS part_zone_id,
  CAST(l_suppkey AS INTEGER) AS supp_zone_id,
  CAST(l_linenumber AS INTEGER) AS line_number,
  CAST(l_quantity AS DOUBLE)      AS quantity,
  CAST(l_extendedprice AS DOUBLE) AS extended_price
FROM lineitem
WHERE l_shipdate IS NOT NULL AND l_orderkey IS NOT NULL
  AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
  AND l_quantity > 0 AND l_extendedprice > 0
"""
