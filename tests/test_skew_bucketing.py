"""Skew mitigation + bucketed co-located joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.catalog import load
from nyc_taxi_data_prediction_pyspark_spark.operators import skew
from nyc_taxi_data_prediction_pyspark_spark.plans import explain
from nyc_taxi_data_prediction_pyspark_spark.sources.warehouse import Warehouse


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    plain = {
        (r["l_returnflag"]): (r["n"], r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("s"))
        .collect()
    }
    salted = {
        (r["l_returnflag"]): (r["n"], r["s"])
        for r in skew.salted_agg(
            li,
            ["l_returnflag"],
            {
                "n": F.count(F.lit(1)),
                "s": F.sum(F.col("l_quantity").cast("decimal(18,4)")),
            },
            buckets=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, "o_custkey").count()
    salted = skew.salted_join(orders, cust, ["o_custkey"], buckets=4).count()
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the same key join without a shuffle."""
    wh = Warehouse(spark, str(tmp_path / "whb"))
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    wh.save_bucketed("b_orders", orders, buckets=4, key=["o_custkey"])
    wh.save_bucketed("b_cust", cust, buckets=4, key=["o_custkey"])
    joined = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
    # co-bucketed: SortMergeJoin with zero hash exchanges
    assert explain.exchange_count(joined) == 0
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")
