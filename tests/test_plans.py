"""Physical-plan assertions: the 100 TB posture is checked, not
assumed — pushdown reaches the scan, small dims broadcast, top-k
avoids global sorts, aggregates have map-side partials."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.catalog import load
from nyc_taxi_data_prediction_pyspark_spark.operators import aggregates as agg, topk


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_of(li)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    ev = load(spark, sf_dir, "orders")
    df = topk.top_k(ev, 10, F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    assert "TakeOrderedAndProject" in plan_of(df)


def test_grouped_agg_has_partial_aggregate(spark, sf_dir):
    df = agg.pricing_summary(load(spark, sf_dir, "lineitem"))
    plan = plan_of(df)
    # partial_ sums before the exchange = map-side combine
    assert "partial_" in plan and "Exchange hashpartitioning" in plan


def test_whole_stage_codegen_covers_clean(spark, sf_dir):
    from nyc_taxi_data_prediction_pyspark_spark.operators.cleaning import (
        clean_lineitem_as_trips,
    )

    plan = plan_of(clean_lineitem_as_trips(load(spark, sf_dir, "lineitem")))
    # '*(n)' node prefix = inside a WholeStageCodegen span
    assert "*(1) Project" in plan and "*(1) Filter" in plan
