"""J2 joins: broadcast enrichment, hour-bucket join, as-of join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.operators.joins import (
    asof_join,
    broadcast_enrich,
    hour_bucket_join,
)


def ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


def test_broadcast_enrich_plan_is_broadcast(spark, sf_dir):
    from nyc_taxi_data_prediction_pyspark_spark.catalog import load

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    joined = broadcast_enrich(orders, cust, o_custkey="c_custkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_hour_bucket_join_matches_observation(spark):
    events = spark.createDataFrame(
        [(1, ts(10, 15)), (2, ts(10, 45)), (3, ts(11, 5)), (4, ts(12, 0))],
        "event_id long, ts timestamp",
    )
    obs = spark.createDataFrame(
        [(ts(10), 55.0), (ts(11), 60.0)], "obs_ts timestamp, temp_f double"
    )
    out = hour_bucket_join(events, obs, event_ts="ts", obs_ts="obs_ts", how="left")
    got = {r["event_id"]: r["temp_f"] for r in out.collect()}
    assert got == {1: 55.0, 2: 55.0, 3: 60.0, 4: None}


def test_asof_join_picks_latest_at_or_before(spark):
    probe = spark.createDataFrame(
        [(1, 100, ts(10, 30)), (1, 101, ts(9, 0)), (2, 102, ts(11, 0))],
        "user_id long, event_id long, pts timestamp",
    )
    build = spark.createDataFrame(
        [(1, ts(10, 0), 10.0), (1, ts(10, 30), 20.0), (1, ts(11, 0), 30.0), (2, ts(10, 0), 40.0)],
        "user_id long, bts timestamp, obs double",
    )
    out = asof_join(
        probe, build, on=["user_id"], probe_ts="pts", build_ts="bts", value_cols=["obs"]
    )
    got = {r["event_id"]: r["obs"] for r in out.collect()}
    # event 100 @10:30 → build @10:30 (equal ts matches); 101 @9:00 → none; 102 → 40.0
    assert got == {100: 20.0, 101: None, 102: 40.0}
    assert set(out.columns) == {"user_id", "event_id", "pts", "obs"}


def test_asof_join_no_cross_join_in_plan(spark):
    probe = spark.createDataFrame([(1, 100, ts(10))], "user_id long, event_id long, pts timestamp")
    build = spark.createDataFrame([(1, ts(9), 1.0)], "user_id long, bts timestamp, obs double")
    plan = asof_join(
        probe, build, on=["user_id"], probe_ts="pts", build_ts="bts", value_cols=["obs"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_forward_inclusive_and_tolerance(spark):
    probe = spark.createDataFrame(
        [(1, 100, ts(10, 0)), (1, 101, ts(10, 30)), (1, 102, ts(12, 0))],
        "user_id long, event_id long, pts timestamp",
    )
    build = spark.createDataFrame(
        [(1, ts(10, 30), 20.0), (1, ts(13, 30), 30.0)],
        "user_id long, bts timestamp, obs double",
    )
    out = asof_join(
        probe, build, on=["user_id"], probe_ts="pts", build_ts="bts",
        value_cols=["obs"], direction="forward",
        tolerance_micros=3_600_000_000,  # 1 hour
    )
    got = {r["event_id"]: r["obs"] for r in out.collect()}
    # 100 @10:00 → 10:30 within 1h; 101 @10:30 → equal ts matches;
    # 102 @12:00 → next build 13:30 is 1.5h away → tolerance nulls it
    assert got == {100: 20.0, 101: 20.0, 102: None}


def test_asof_nearest_ties_backward(spark):
    probe = spark.createDataFrame(
        [(1, 100, ts(10, 30)), (1, 101, ts(10, 40)), (1, 102, ts(9, 0))],
        "user_id long, event_id long, pts timestamp",
    )
    build = spark.createDataFrame(
        [(1, ts(10, 0), 1.0), (1, ts(11, 0), 2.0)],
        "user_id long, bts timestamp, obs double",
    )
    out = asof_join(
        probe, build, on=["user_id"], probe_ts="pts", build_ts="bts",
        value_cols=["obs"], direction="nearest",
    )
    got = {r["event_id"]: r["obs"] for r in out.collect()}
    # 100: exactly midway (30 min each) → tie → backward (1.0);
    # 101: 40 min back vs 20 min forward → forward (2.0);
    # 102: before everything → forward only (1.0)
    assert got == {100: 1.0, 101: 2.0, 102: 1.0}


def test_asof_directions_share_one_exchange(spark):
    probe = spark.createDataFrame(
        [(1, 100, ts(10))], "user_id long, event_id long, pts timestamp"
    )
    build = spark.createDataFrame(
        [(1, ts(9), 1.0)], "user_id long, bts timestamp, obs double"
    )
    plan = asof_join(
        probe, build, on=["user_id"], probe_ts="pts", build_ts="bts",
        value_cols=["obs"], direction="nearest",
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # backward + forward passes must reuse ONE shuffle of the union
    # (two in-partition sorts, two Window execs, one Exchange)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
