"""SCD type-2 dimension merge: versioning, idempotency, history
integrity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.sources.warehouse import Warehouse

T1 = dt.datetime(2026, 1, 1)
T2 = dt.datetime(2026, 2, 1)
SCHEMA = "cust_id long, segment string, balance double"


def _wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def test_scd2_versions_changed_rows_only(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    b1 = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "A", 30.0)], SCHEMA
    )
    r1 = wh.scd2_merge("dim_cust", b1, key=["cust_id"], attrs=["segment", "balance"], batch_ts=T1)
    assert r1 == {"closed": 0, "inserted": 3}

    # 1 changes segment, 2 unchanged, 4 is new
    b2 = spark.createDataFrame(
        [(1, "C", 10.0), (2, "B", 20.0), (4, "B", 40.0)], SCHEMA
    )
    r2 = wh.scd2_merge("dim_cust", b2, key=["cust_id"], attrs=["segment", "balance"], batch_ts=T2)
    assert r2 == {"closed": 1, "inserted": 2}

    dim = wh.read("dim_cust")
    cur = {r["cust_id"]: r for r in dim.filter("is_current").collect()}
    assert set(cur) == {1, 2, 3, 4}
    assert cur[1]["segment"] == "C" and cur[1]["valid_from"] == T2
    assert cur[2]["valid_from"] == T1  # untouched keeps original version
    old = dim.filter(~F.col("is_current")).collect()
    assert len(old) == 1
    assert old[0]["cust_id"] == 1 and old[0]["segment"] == "A" and old[0]["valid_to"] == T2


def test_scd2_idempotent_redelivery(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    b = spark.createDataFrame([(1, "A", 10.0), (2, "B", 20.0)], SCHEMA)
    wh.scd2_merge("dim", b, key=["cust_id"], attrs=["segment", "balance"], batch_ts=T1)
    r = wh.scd2_merge("dim", b, key=["cust_id"], attrs=["segment", "balance"], batch_ts=T2)
    assert r == {"closed": 0, "inserted": 0}
    assert wh.read("dim").count() == 2


def test_scd2_null_attr_transitions(spark, tmp_path):
    """NULL→value and value→NULL must both count as changes
    (eqNullSafe comparison), NULL→NULL must not."""
    wh = _wh(spark, tmp_path)
    b1 = spark.createDataFrame([(1, None, 10.0), (2, None, 20.0)], SCHEMA)
    wh.scd2_merge("dim_n", b1, key=["cust_id"], attrs=["segment"], batch_ts=T1)
    b2 = spark.createDataFrame([(1, "A", 10.0), (2, None, 99.0)], SCHEMA)
    r = wh.scd2_merge("dim_n", b2, key=["cust_id"], attrs=["segment"], batch_ts=T2)
    assert r == {"closed": 1, "inserted": 1}  # only cust 1 (balance untracked)
