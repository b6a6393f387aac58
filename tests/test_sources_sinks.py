"""Sources/sinks: discovery, CSV parity options, warehouse lifecycle,
REST weather source (canned payload)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.schemas import WEATHER
from nyc_taxi_data_prediction_pyspark_spark.sources import csv_io, discovery, rest
from nyc_taxi_data_prediction_pyspark_spark.sources.warehouse import Warehouse


def test_latest_partition_newest_first(tmp_path):
    for m in ("2026-01", "2026-03"):
        (tmp_path / f"yellow_tripdata_{m}.parquet").touch()
    got = discovery.latest_partition(
        discovery.month_candidates(2026, 6), discovery.fs_prober(str(tmp_path))
    )
    assert got == "2026-03"  # probes 06,05,04 (missing) → hits 03, never 01


def test_latest_partition_none_available(tmp_path):
    got = discovery.latest_partition(
        discovery.month_candidates(2026, 3), discovery.fs_prober(str(tmp_path))
    )
    assert got is None


def test_csv_roundtrip_null_parity(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, None, None)], "id long, s string, v double"
    )
    path = str(tmp_path / "out_csv")
    csv_io.write_csv(df, path, single_file=True)
    back = csv_io.read_csv(spark, path, df.schema)
    assert back.orderBy("id").collect() == df.orderBy("id").collect()
    # single-file option reproduces the reference's one part-*.csv
    parts = [f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".csv")]
    assert len(parts) == 1


def test_warehouse_merge_load_idempotent(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    wh.ensure("t", df)
    assert wh.merge_load("t", df, ["k"], load_ts=True) == 2
    assert wh.merge_load("t", df, ["k"], load_ts=True) == 0  # re-run inserts nothing
    assert wh.read("t").count() == 2
    assert "load_ts" in wh.read("t").columns  # audit column stamped at ingest

    # audit fidelity: existing rows keep their original load_ts; only
    # newly inserted rows get a fresh stamp (reference INSERT-default)
    ts_before = {r["k"]: r["load_ts"] for r in wh.read("t").collect()}
    df2 = spark.createDataFrame([(3, "c")], "k long, v string")
    assert wh.merge_load("t", df2, ["k"], load_ts=True) == 1
    ts_after = {r["k"]: r["load_ts"] for r in wh.read("t").collect()}
    assert ts_after[1] == ts_before[1] and ts_after[2] == ts_before[2]

    wh.truncate("t")
    assert wh.read("t").count() == 0


def test_warehouse_stage_lifecycle(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    p1 = wh.stage_dir("s1")
    (os.path.join(p1, "f"))
    open(os.path.join(p1, "f"), "w").write("x")
    p2 = wh.stage_dir("s1", replace=True)  # CREATE OR REPLACE STAGE
    assert p1 == p2 and not os.listdir(p2)


CANNED = {
    "name": "New York",
    "main": {"temp": 34.7, "humidity": 60},
    "weather": [{"description": "few clouds"}],
    "extra": {"nested": [1, 2, 3]},
}


def test_weather_observation_typed_extraction(spark):
    df = rest.weather_observation(spark, fetch=lambda: CANNED)
    row = df.first()
    assert row["city"] == "New York"
    assert row["temp_f"] == 34.7
    assert row["weather_desc"] == "few clouds"
    assert row["humidity_pct"] == 60
    assert json.loads(row["raw_json"])["extra"]["nested"] == [1, 2, 3]
    assert [f.name for f in WEATHER.fields] == df.columns


def test_weather_observation_missing_name_falls_back(spark):
    payload = {k: v for k, v in CANNED.items() if k != "name"}
    row = rest.weather_observation(spark, fetch=lambda: payload, default_city="Gotham").first()
    assert row["city"] == "Gotham"


def test_read_merge_schema_reconciles_evolved_files(spark, tmp_path):
    from nyc_taxi_data_prediction_pyspark_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    gen1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    gen2 = spark.createDataFrame(
        [(3, 30.0, "x"), (4, 40.0, "y")], "id long, v double, tag string"
    )
    wh.append("evo", gen1, load_ts=False)
    files_before = {
        f for f in os.listdir(wh.path("evo")) if f.endswith(".parquet")
    }
    wh.append("evo", gen2, load_ts=False)
    merged = wh.read("evo", merge_schema=True)
    assert set(merged.columns) == {"id", "v", "tag"}
    got = {r["id"]: r["tag"] for r in merged.collect()}
    # legacy files surface NULL for the evolved column...
    assert got == {1: None, 2: None, 3: "x", 4: "y"}
    # ...and were NOT rewritten (additive evolution is metadata-only)
    files_after = {
        f for f in os.listdir(wh.path("evo")) if f.endswith(".parquet")
    }
    assert files_before <= files_after


def test_snapshot_versioning_time_travel_and_vacuum(spark, tmp_path):
    from nyc_taxi_data_prediction_pyspark_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df1 = spark.createDataFrame([(1, 10.0)], "id long, v double")
    df2 = spark.createDataFrame([(1, 11.0), (2, 20.0)], "id long, v double")
    v1 = wh.snapshot_write("t", df1)
    v2 = wh.snapshot_write("t", df2)
    assert (v1, v2) == (1, 2)
    assert wh.snapshot_versions("t") == [1, 2]
    # current pointer -> v2; explicit version -> time travel to v1
    assert wh.read_snapshot("t").count() == 2
    assert {r["v"] for r in wh.read_snapshot("t", v1).collect()} == {10.0}
    # a third write never disturbs v1/v2 readers (immutable dirs)
    wh.snapshot_write("t", df1.unionAll(df2))
    assert wh.read_snapshot("t", v1).count() == 1
    # vacuum keeps the newest and the pointer target
    dropped = wh.vacuum_snapshots("t", keep_last=1)
    assert dropped == [1, 2]
    assert wh.snapshot_versions("t") == [3]
    assert wh.read_snapshot("t").count() == 3


# ---------------------------------------------- multi-table txn snapshots


def _mk_wh(spark, tmp_path):
    from nyc_taxi_data_prediction_pyspark_spark.sources.warehouse import Warehouse

    return Warehouse(spark, str(tmp_path / "wh"))


def test_multi_snapshot_write_is_cross_table_consistent(spark, tmp_path):
    wh = _mk_wh(spark, tmp_path)
    f1 = spark.range(3).withColumnRenamed("id", "k")
    d1 = spark.range(2).withColumnRenamed("id", "dim")
    vs = wh.multi_snapshot_write({"fact": f1, "dim": d1})
    assert vs == {"fact": 1, "dim": 1}
    assert wh.read_txn("fact").count() == 3 and wh.read_txn("dim").count() == 2

    f2 = spark.range(10).withColumnRenamed("id", "k")
    d2 = spark.range(5).withColumnRenamed("id", "dim")
    vs = wh.multi_snapshot_write({"fact": f2, "dim": d2})
    assert vs == {"fact": 2, "dim": 2}
    assert wh.read_txn("fact").count() == 10 and wh.read_txn("dim").count() == 5
    # time travel to the pre-txn versions still works per table
    assert wh.read_snapshot("fact", 1).count() == 3


def test_multi_snapshot_crash_before_commit_leaves_old_state(spark, tmp_path, monkeypatch):
    """Crash injected at the commit point (the _txn rename): both
    tables' data directories exist but read_txn must still see the
    OLD consistent pair — the publish-pointer-LAST contract."""
    import os as _os

    wh = _mk_wh(spark, tmp_path)
    wh.multi_snapshot_write(
        {"fact": spark.range(3).withColumnRenamed("id", "k"),
         "dim": spark.range(2).withColumnRenamed("id", "dim")}
    )

    real_replace = _os.replace

    def exploding_replace(src, dst):
        if dst.endswith("_txn"):
            raise OSError("injected crash at the commit point")
        return real_replace(src, dst)

    monkeypatch.setattr(_os, "replace", exploding_replace)
    try:
        wh.multi_snapshot_write(
            {"fact": spark.range(99).withColumnRenamed("id", "k"),
             "dim": spark.range(99).withColumnRenamed("id", "dim")}
        )
    except OSError:
        pass
    monkeypatch.undo()
    # staged v2 directories exist, but the committed view is intact
    assert wh.snapshot_versions("fact") == [1, 2]
    assert wh.read_txn("fact").count() == 3
    assert wh.read_txn("dim").count() == 2
    # retry after the crash commits cleanly (next free version)
    vs = wh.multi_snapshot_write(
        {"fact": spark.range(7).withColumnRenamed("id", "k"),
         "dim": spark.range(4).withColumnRenamed("id", "dim")}
    )
    assert wh.read_txn("fact").count() == 7 and wh.read_txn("dim").count() == 4
    assert vs == {"fact": 3, "dim": 3}


def test_multi_snapshot_crash_after_commit_still_consistent(spark, tmp_path, monkeypatch):
    """Crash between the txn commit and the per-table convenience
    pointers: read_txn sees the NEW pair (the commit happened)."""
    import os as _os

    wh = _mk_wh(spark, tmp_path)
    wh.multi_snapshot_write(
        {"fact": spark.range(3).withColumnRenamed("id", "k"),
         "dim": spark.range(2).withColumnRenamed("id", "dim")}
    )
    real_replace = _os.replace
    state = {"committed": False}

    def crash_after_txn(src, dst):
        if dst.endswith("_txn"):
            real_replace(src, dst)
            state["committed"] = True
            raise OSError("injected crash right after the commit point")
        return real_replace(src, dst)

    monkeypatch.setattr(_os, "replace", crash_after_txn)
    try:
        wh.multi_snapshot_write(
            {"fact": spark.range(8).withColumnRenamed("id", "k"),
             "dim": spark.range(6).withColumnRenamed("id", "dim")}
        )
    except OSError:
        pass
    monkeypatch.undo()
    assert state["committed"]
    assert wh.read_txn("fact").count() == 8
    assert wh.read_txn("dim").count() == 6
