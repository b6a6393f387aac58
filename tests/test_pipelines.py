"""End-to-end pipeline integration: the reference's two DAGs as
single-engine runs against a tmp landing zone + warehouse."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from nyc_taxi_data_prediction_pyspark_spark.pipelines.etl import (
    FACT_TABLE,
    run_trips_etl,
    verification_queries,
)
from nyc_taxi_data_prediction_pyspark_spark.pipelines.weather import (
    latest_observations,
    run_weather_feed,
)

RAW_SCHEMA = (
    "tpep_pickup_datetime timestamp, tpep_dropoff_datetime timestamp, "
    "PULocationID long, DOLocationID long, passenger_count double, "
    "trip_distance double, total_amount double, VendorID long"
)


def _write_landing(spark, root, month, n=50, dirty=True):
    t0 = dt.datetime(int(month[:4]), int(month[5:7]), 1, 8, 0)  # distinct keys per month
    rows = [
        (t0 + dt.timedelta(minutes=i), t0 + dt.timedelta(minutes=i + 20), 100 + i, 200 + i,
         1.0, 2.0 + i, 15.0 + i, 2)
        for i in range(n)
    ]
    if dirty:
        rows += [
            (None, t0, 1, 2, 1.0, 3.0, 9.0, 2),          # null pickup → dropped
            (t0, t0, 3, 4, 1.0, -1.0, 9.0, 2),           # non-positive distance
            (t0, t0, 5, 6, 1.0, 3.0, 0.0, 2),            # zero amount
        ]
    df = spark.createDataFrame(rows, RAW_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(f"{root}/yellow_tripdata_{month}.parquet")


def test_trips_etl_end_to_end_and_idempotent(spark, tmp_path):
    landing = str(tmp_path / "landing")
    wh_root = str(tmp_path / "wh")
    _write_landing(spark, landing, "2026-03")

    r1 = run_trips_etl(
        spark, landing_root=landing, warehouse_root=wh_root, year=2026, newest_month=6
    )
    assert r1.month == "2026-03"          # probed 06,05,04 → found 03
    assert r1.rows_cleaned == 50          # dirty rows dropped
    assert r1.rows_inserted == 50
    assert r1.fact_count == 50

    # re-run the same month: the MERGE invariant — no new rows
    r2 = run_trips_etl(
        spark, landing_root=landing, warehouse_root=wh_root, year=2026, newest_month=6
    )
    assert r2.rows_inserted == 0 and r2.fact_count == 50

    # a newer month lands → only its rows insert
    _write_landing(spark, landing, "2026-04", n=10, dirty=False)
    r3 = run_trips_etl(
        spark, landing_root=landing, warehouse_root=wh_root, year=2026, newest_month=6
    )
    assert r3.month == "2026-04" and r3.rows_inserted == 10 and r3.fact_count == 60

    v = verification_queries(spark, wh_root)
    assert v["count"].first()["cnt"] == 60
    assert v["sample"].count() == 20
    dr = v["date_range"].first()
    assert dr["first_pickup"].month == 3 and dr["last_pickup"].month in (3, 4)
    assert v["latest_loads"].count() == 10


CANNED = {
    "name": "New York",
    "main": {"temp": 41.0, "humidity": 70},
    "weather": [{"description": "light rain"}],
}


def test_weather_feed_appends_one_row_per_tick(spark, tmp_path):
    wh_root = str(tmp_path / "whw")
    assert run_weather_feed(spark, warehouse_root=wh_root, fetch=lambda: CANNED) == 1
    assert run_weather_feed(spark, warehouse_root=wh_root, fetch=lambda: CANNED) == 2
    latest = latest_observations(spark, wh_root, k=10)
    rows = latest.collect()
    assert len(rows) == 2
    assert rows[0]["load_ts"] >= rows[1]["load_ts"]
    assert rows[0]["temp_f"] == 41.0


def test_etl_audit_metrics_from_single_pass(spark, tmp_path):
    """df.observe audit: rows_cleaned and the date range come from the
    merge's own write action (no separate count scan) and must agree
    with a direct recount of the written fact table."""
    from nyc_taxi_data_prediction_pyspark_spark.pipelines import etl as etl_mod
    from nyc_taxi_data_prediction_pyspark_spark.sources.warehouse import Warehouse

    landing, wroot = str(tmp_path / "landing"), str(tmp_path / "wh")
    _write_landing(spark, landing, "2026-03")
    res = etl_mod.run_trips_etl(
        spark, landing_root=landing, warehouse_root=wroot, year=2026, newest_month=3
    )
    fact = Warehouse(spark, wroot).read(etl_mod.FACT_TABLE)
    assert res.rows_cleaned == res.rows_inserted == fact.count()
    lo, hi = fact.agg(F.min("pickup_datetime"), F.max("pickup_datetime")).collect()[0]
    assert res.first_pickup == lo and res.last_pickup == hi


def test_training_data_pipeline_invariants(spark, sf_dir):
    """End-to-end dedup→chunk→gate→budget→pack composition: duplicate
    docs removed, every chunk above the gate, offsets within seq_len,
    packing dense in chunk order, and the whole thing deterministic."""
    from nyc_taxi_data_prediction_pyspark_spark.catalog import load
    from nyc_taxi_data_prediction_pyspark_spark.operators import dedup as dedup_ops
    from nyc_taxi_data_prediction_pyspark_spark.pipelines.training_data import (
        build_training_set,
    )

    out = build_training_set(spark, sf_dir, seq_len=512, min_chunk_tokens=8)
    rows = out.orderBy("chunk_key").collect()
    assert len(rows) > 0

    # dedup really removed the minhash losers
    docs = load(spark, sf_dir, "documents")
    pairs = dedup_ops.minhash_native_pairs(
        docs, text_col="text", id_col="doc_id",
        n=3, k=16, bands=4, jaccard_threshold=0.3, seed=42,
    )
    survivors = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    losers = {
        r["node"]
        for r in dedup_ops.connected_components(pairs.select("id_a", "id_b")).collect()
        if r["node"] != r["cluster_id"]
    }
    assert survivors.isdisjoint(losers)

    # gate + packing invariants
    assert all(r["n_tokens"] >= 8 for r in rows)
    assert all(0 <= r["pack_offset"] < 512 for r in rows)
    pack_ids = [r["pack_id"] for r in rows]
    assert pack_ids == sorted(pack_ids)  # contiguous layout in chunk order

    # deterministic end-to-end
    again = build_training_set(spark, sf_dir, seq_len=512, min_chunk_tokens=8)
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0
