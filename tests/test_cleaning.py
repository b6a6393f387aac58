"""Cleaning contract (P1-P4, O1) — dirty-row coverage per FIXTURES.md A1."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from nyc_taxi_data_prediction_pyspark_spark.operators.cleaning import clean_trips
from nyc_taxi_data_prediction_pyspark_spark.schemas import TRIPS_CLEAN, conforms

T0 = dt.datetime(2026, 1, 1, 10, 0)
T1 = dt.datetime(2026, 1, 1, 10, 30)


def raw_row(**over):
    base = dict(
        tpep_pickup_datetime=T0,
        tpep_dropoff_datetime=T1,
        PULocationID=132,
        DOLocationID=48,
        passenger_count=1.0,
        trip_distance=3.5,
        total_amount=21.0,
        VendorID=2,          # extra TLC column: must be pruned
        fare_amount=17.5,    # extra TLC column: must be pruned
    )
    base.update(over)
    return Row(**base)


def make_raw(spark, rows):
    return spark.createDataFrame(
        rows,
        "tpep_pickup_datetime timestamp, tpep_dropoff_datetime timestamp, "
        "PULocationID long, DOLocationID long, passenger_count double, "
        "trip_distance double, total_amount double, VendorID long, fare_amount double",
    )


def test_clean_schema_and_pruning(spark):
    df = make_raw(spark, [raw_row()])
    out = clean_trips(df)
    assert conforms(out.schema, TRIPS_CLEAN) == []
    assert set(out.columns) == {f.name for f in TRIPS_CLEAN.fields}


def test_null_key_rows_dropped(spark):
    rows = [
        raw_row(),
        raw_row(tpep_pickup_datetime=None),
        raw_row(tpep_dropoff_datetime=None),
        raw_row(PULocationID=None),
        raw_row(DOLocationID=None),
    ]
    out = clean_trips(make_raw(spark, rows))
    assert out.count() == 1


def test_nonpositive_filters_reject_nulls_too(spark):
    rows = [
        raw_row(),
        raw_row(trip_distance=0.0),
        raw_row(trip_distance=-1.0),
        raw_row(trip_distance=None),  # NULL-rejecting > 0, like the reference
        raw_row(total_amount=0.0),
        raw_row(total_amount=None),
    ]
    out = clean_trips(make_raw(spark, rows))
    assert out.count() == 1


def test_passenger_count_nullable_survives(spark):
    out = clean_trips(make_raw(spark, [raw_row(passenger_count=None)]))
    assert out.count() == 1
    assert out.first()["passenger_count"] is None


def test_cap_limits_rows(spark):
    rows = [raw_row(PULocationID=i) for i in range(1, 50)]
    out = clean_trips(make_raw(spark, rows), cap=10)
    assert out.count() == 10


def test_filter_pushdown_in_plan(spark, sf_dir):
    """P4 predicates must reach the parquet scan (PushedFilters)."""
    from nyc_taxi_data_prediction_pyspark_spark.catalog import load
    from nyc_taxi_data_prediction_pyspark_spark.operators.cleaning import (
        clean_lineitem_as_trips,
    )

    plan = clean_lineitem_as_trips(load(spark, sf_dir, "lineitem"))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity,0.0)" in plan
