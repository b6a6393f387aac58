"""J1 merge-upsert semantics + the reference's documented quirks
(SURVEY.md §2.3): float-equality keys, passenger_count collapse,
NULL-key always-insert, idempotency."""

from __future__ import annotations

import datetime as dt

from nyc_taxi_data_prediction_pyspark_spark.operators.merge import (
    TRIP_MERGE_KEY,
    apply_cdc,
    merge_upsert,
)

SCHEMA = (
    "pickup_datetime timestamp, dropoff_datetime timestamp, pickup_zone_id int, "
    "dropoff_zone_id int, passenger_count int, trip_distance double, total_amount double"
)

T0 = dt.datetime(2026, 1, 1, 10, 0)
T1 = dt.datetime(2026, 1, 1, 10, 30)


def trip(pc=1, dist=3.5, amt=21.0, t0=T0):
    return (t0, T1, 132, 48, pc, dist, amt)


def test_insert_only_unmatched(spark):
    fact = spark.createDataFrame([trip()], SCHEMA)
    stg = spark.createDataFrame([trip(), trip(dist=9.9)], SCHEMA)
    merged = merge_upsert(stg, fact, TRIP_MERGE_KEY)
    assert merged.count() == 2


def test_idempotent_double_load(spark):
    """The reference's own invariant (readme.md:30): re-running the
    load must not change the fact table."""
    fact = spark.createDataFrame([trip(), trip(dist=9.9)], SCHEMA)
    stg = spark.createDataFrame([trip(), trip(dist=9.9)], SCHEMA)
    once = merge_upsert(stg, fact, TRIP_MERGE_KEY)
    twice = merge_upsert(stg, once, TRIP_MERGE_KEY)
    assert once.count() == twice.count() == 2


def test_passenger_count_not_in_key_collapses(spark):
    """Two trips differing only in passenger_count: second never lands
    (etl_spark_historical.py:306-311 quirk, preserved)."""
    fact = spark.createDataFrame([trip(pc=1)], SCHEMA)
    stg = spark.createDataFrame([trip(pc=4)], SCHEMA)
    merged = merge_upsert(stg, fact, TRIP_MERGE_KEY)
    assert merged.count() == 1
    assert merged.first()["passenger_count"] == 1


def test_null_keyed_rows_always_insert(spark):
    """NULL = NULL is falsy in the key comparison → NULL-keyed staging
    rows insert every time (documented reinsert behavior)."""
    null_amt = (T0, T1, 132, 48, 1, 3.5, None)
    fact = spark.createDataFrame([null_amt], SCHEMA)
    stg = spark.createDataFrame([null_amt], SCHEMA)
    merged = merge_upsert(stg, fact, TRIP_MERGE_KEY)
    assert merged.count() == 2  # duplicate NULL-key row reinserted


def test_float_equality_key_exact(spark):
    """Float key columns compared by equality — 3.5 vs 3.5000001 are
    different keys (no rounding, etl_spark_historical.py:310-311)."""
    fact = spark.createDataFrame([trip(dist=3.5)], SCHEMA)
    stg = spark.createDataFrame([trip(dist=3.5000001)], SCHEMA)
    assert merge_upsert(stg, fact, TRIP_MERGE_KEY).count() == 2


def test_apply_cdc_latest_op_wins(spark):
    """CDC replay: updates replace, deletes remove, inserts add,
    same-seq ties prefer the delete, and untouched base rows pass
    through — all per latest (seq, delete-first) order."""
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 1, "U"),   # plain update
            (2, "x", 1, "U"),    # superseded by the seq-2 delete
            (2, None, 2, "D"),
            (3, "zz", 2, "D"),   # same-seq tie below: delete must win
            (3, "z", 2, "U"),
            (5, "new", 1, "U"),  # insert (key not in base)
        ],
        "k long, v string, seq long, op string",
    )
    out = {
        r.k: r.v
        for r in apply_cdc(base, changes, key=["k"], seq_col="seq").collect()
    }
    assert out == {1: "a2", 4: "d", 5: "new"}


def test_apply_cdc_replay_idempotent(spark):
    """Applying the same change log to an already-applied table is a
    no-op for deletes (keys gone) and updates (values identical)."""
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "a2", 1, "U"), (2, None, 2, "D")], "k long, v string, seq long, op string"
    )
    once = apply_cdc(base, changes, key=["k"], seq_col="seq")
    twice = apply_cdc(once, changes, key=["k"], seq_col="seq")
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}
