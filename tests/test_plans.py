"""Physical-plan assertions: the 100 TB posture is checked, not
assumed — pushdown reaches the scan, small dims broadcast, top-k
avoids global sorts, aggregates have map-side partials."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.catalog import load
from nyc_taxi_data_prediction_pyspark_spark.operators import aggregates as agg, topk
from nyc_taxi_data_prediction_pyspark_spark.plans import explain


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    schemas = explain.read_schemas(li)
    assert schemas and "struct<l_orderkey:bigint,l_quantity:double>" in schemas[0]


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    from nyc_taxi_data_prediction_pyspark_spark.operators.cleaning import (
        clean_lineitem_as_trips,
    )

    pushed = explain.pushed_filters(clean_lineitem_as_trips(load(spark, sf_dir, "lineitem")))
    assert "GreaterThan(l_quantity" in ",".join(pushed)


def test_topk_uses_take_ordered(spark, sf_dir):
    df = topk.top_k(
        load(spark, sf_dir, "orders"), 10, F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    assert explain.uses_take_ordered(df)


def test_grouped_agg_has_partial_aggregate(spark, sf_dir):
    df = agg.pricing_summary(load(spark, sf_dir, "lineitem"))
    assert explain.has_partial_aggregate(df)
    assert explain.exchange_count(df) == 1  # exactly one shuffle: the group keys


def test_whole_stage_codegen_covers_clean(spark, sf_dir):
    from nyc_taxi_data_prediction_pyspark_spark.operators.cleaning import (
        clean_lineitem_as_trips,
    )

    df = clean_lineitem_as_trips(load(spark, sf_dir, "lineitem"))
    assert explain.codegen_span_count(df) >= 1


def test_asof_join_single_exchange_no_cartesian(spark, sf_dir):
    """The as-of union trick must cost one shuffle (the window) and
    never degrade to a cross join."""
    import __spark_entry__ as e

    df = e.q24_asof_join(spark, sf_dir)
    assert not explain.has_cartesian(df)
    assert explain.exchange_count(df) <= 2  # union repartition + window sort


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    """q58's accuracy contract is now computed IN-QUERY as error-bound
    booleans (round-6): every boolean must come back true, the exact
    columns must equal an independent exact aggregation, and no group
    may be missing."""
    import __spark_entry__ as e

    approx = {r["l_returnflag"]: r for r in e.q58_approx_stats(spark, sf_dir).collect()}
    li = load(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        ex = exact[flag]
        assert a["n_rows"] == ex["n_rows"]
        assert a["exact_parts"] == ex["n_parts"]
        for b in ("parts_within_4rsd", "median_within_band", "p25_within_band", "p75_within_band"):
            assert a[b] is True, (flag, b)


def test_merge_upsert_is_join_not_loop(spark, sf_dir):
    import __spark_entry__ as e

    df = e.q06_merge_upsert(spark, sf_dir)
    p = explain.physical_plan(df)
    assert "Join LeftAnti" in p or "LeftAnti" in p


def test_merge_prune_reaches_partition_scan(spark, sf_dir):
    """q92's `prune` predicate must become a PartitionFilter on the
    hive-partitioned fact probe — the 100 TB merge contract: the
    anti-join reads ONE month directory, not the whole fact table."""
    import __spark_entry__ as e

    df = e.q92_merge_prune_partitioned(spark, sf_dir)
    pf = explain.partition_filters(df)
    assert any("ship_month" in p and "1997-06" in p for p in pf), pf
    # the merge itself still plans as an anti-join, never a loop
    assert "LeftAnti" in explain.physical_plan(df)
