"""Partition-pruned fact-table layout: the 100 TB design is a
month-partitioned table where time-ranged queries and merge probes
touch only matching directories — asserted from the plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.plans import explain
from nyc_taxi_data_prediction_pyspark_spark.sources.warehouse import Warehouse


def test_month_partitioned_fact_prunes(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "whp"))
    rows = [
        (dt.datetime(2026, m, d, 10), float(m), f"2026-{m:02d}")
        for m in (1, 2, 3)
        for d in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "pickup_datetime timestamp, total_amount double, trip_month string")
    wh.append("fact_p", df, load_ts=False, partition_by=["trip_month"])

    scan = wh.read("fact_p").where(F.col("trip_month") == "2026-02")
    plan = explain.physical_plan(scan)
    assert "PartitionFilters: [isnotnull(trip_month" in plan
    assert scan.count() == 3  # only February rows read
    # files actually touched: one partition directory
    assert scan.select(F.input_file_name()).distinct().count() <= 2


def test_merge_probe_with_prune_predicate(spark, tmp_path):
    from nyc_taxi_data_prediction_pyspark_spark.operators.merge import merge_upsert

    wh = Warehouse(spark, str(tmp_path / "whp2"))
    fact = spark.createDataFrame(
        [(1, "2026-01"), (2, "2026-02")], "k long, trip_month string"
    )
    wh.append("fact_m", fact, load_ts=False, partition_by=["trip_month"])
    stored = wh.read("fact_m")

    stg = spark.createDataFrame([(2, "2026-02"), (3, "2026-02")], "k long, trip_month string")
    merged = merge_upsert(
        stg, stored, ["k", "trip_month"], prune=F.col("trip_month") == "2026-02"
    )
    got = sorted((r["k"], r["trip_month"]) for r in merged.collect())
    # fact rows preserved + only the genuinely-new staging row inserted
    assert got == [(1, "2026-01"), (2, "2026-02"), (3, "2026-02")]
