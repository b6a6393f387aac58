"""Python Data Source API feed (S4): batch partitioning, JSON payload
round-trip, and the one-row-per-micro-batch stream with offset replay."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.sources import pysource


def _feed(spark, rows=240, partitions=4):
    pysource.register(spark)
    return (
        spark.read.format("weather_feed")
        .option("rows", rows)
        .option("partitions", partitions)
        .load()
    )


def test_batch_read_rows_and_distribution(spark):
    df = _feed(spark, rows=100, partitions=5)
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 100
    ids = [r["obs_id"] for r in df.select("obs_id").collect()]
    assert sorted(ids) == list(range(100))  # no dupes, no gaps across partitions


def test_payload_json_roundtrip(spark):
    df = _feed(spark, rows=48)
    bad = df.filter(
        (F.get_json_object("raw_json", "$.main.temp").cast("double") != F.col("temp_f"))
        | (F.get_json_object("raw_json", "$.main.humidity").cast("int") != F.col("humidity"))
        | (F.get_json_object("raw_json", "$.name") != F.col("city"))
    )
    assert bad.count() == 0


def test_stream_one_observation_per_microbatch(spark, tmp_path):
    pysource.register(spark)
    q = (
        spark.readStream.format("weather_feed")
        .load()
        .writeStream.format("memory")
        .queryName("wf_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            got = spark.sql("SELECT obs_id FROM wf_stream ORDER BY obs_id").collect()
            if len(got) >= 3:
                break
            time.sleep(0.5)
        ids = [r["obs_id"] for r in got]
        assert len(ids) >= 3
        assert ids == list(range(len(ids)))  # contiguous from 0: exactly-once, in order
    finally:
        q.stop()


def test_stream_replay_is_deterministic():
    r = pysource._StreamReader()
    batch, nxt = r.read({"obs_id": 5})
    assert nxt == {"obs_id": 6}
    replayed = list(r.readBetweenOffsets({"obs_id": 5}, {"obs_id": 6}))
    assert list(batch) == replayed == [pysource.observation(5)]


def test_batch_feed_rebase_epoch(spark):
    import datetime as dt

    df = (
        _feed(spark, rows=24)
        .orderBy("obs_id")
        .limit(1)
        .union(
            spark.read.format("weather_feed")
            .option("rows", 24)
            .option("start", "2024-01-01T00:00:00")
            .load()
            .orderBy("obs_id")
            .limit(1)
        )
    )
    stamps = [r["observed_at"] for r in df.collect()]
    assert stamps[0] == dt.datetime(2026, 1, 1)   # default epoch
    assert stamps[1] == dt.datetime(2024, 1, 1)   # re-based epoch


# ---- staged_json sink (Python Data Source WRITER, S7/S8 protocol) ----


def _feed_df(spark, n):
    from nyc_taxi_data_prediction_pyspark_spark.sources import pysource

    pysource.register(spark)
    return spark.read.format("weather_feed").option("rows", n).load()


def test_staged_sink_commit_manifest_and_append(spark, tmp_path):
    from nyc_taxi_data_prediction_pyspark_spark.sources import pysource

    pysource.register_sink(spark)
    d = str(tmp_path / "t1")
    _feed_df(spark, 10).write.format("staged_json").option("path", d).mode("append").save()
    m = pysource.read_manifest(d)
    assert m["total_rows"] == 10
    # append accumulates into the manifest
    _feed_df(spark, 5).write.format("staged_json").option("path", d).mode("append").save()
    m2 = pysource.read_manifest(d)
    assert m2["total_rows"] == 15
    # data round-trip through the committed files only
    import json as _json
    import os

    rows = []
    for e in m2["files"]:
        with open(os.path.join(d, e["file"])) as f:
            rows += [_json.loads(line) for line in f]
    assert len(rows) == 15
    assert {r["city"] for r in rows} <= {"NYC", "BOS", "CHI", "LAX"}


def test_staged_sink_overwrite_replaces(spark, tmp_path):
    from nyc_taxi_data_prediction_pyspark_spark.sources import pysource

    pysource.register_sink(spark)
    d = str(tmp_path / "t2")
    _feed_df(spark, 10).write.format("staged_json").option("path", d).mode("append").save()
    _feed_df(spark, 3).write.format("staged_json").option("path", d).mode("overwrite").save()
    assert pysource.read_manifest(d)["total_rows"] == 3


def test_staged_sink_failed_task_aborts_statement(spark, tmp_path):
    """ON_ERROR='ABORT_STATEMENT' semantics: a mid-write task failure
    must leave the previously committed state fully intact — no
    partial files visible, manifest unchanged."""
    import os

    import pytest

    from nyc_taxi_data_prediction_pyspark_spark.sources import pysource

    pysource.register_sink(spark)
    d = str(tmp_path / "t3")
    _feed_df(spark, 10).write.format("staged_json").option("path", d).mode("append").save()
    before = pysource.read_manifest(d)
    with pytest.raises(Exception, match="injected failure"):
        (
            _feed_df(spark, 50)
            .write.format("staged_json")
            .option("path", d)
            .option("fail_on", "25")
            .mode("append")
            .save()
        )
    after = pysource.read_manifest(d)
    assert after == before
    # nothing but committed files + manifest (+ swept staging) visible
    visible = {n for n in os.listdir(d) if n != "_staging"}
    assert visible == {e["file"] for e in before["files"]} | {"_MANIFEST.json"}
    staged = os.path.join(d, "_staging")
    assert not os.path.exists(staged) or os.listdir(staged) == []


def test_staged_sink_abort_spares_concurrent_staging(spark, tmp_path):
    """abort() sweeps only THIS statement's uuid-namespaced staging dir
    (ADVICE r5): another writer's in-flight staged files must survive a
    concurrent statement's failure."""
    import os

    import pytest

    from nyc_taxi_data_prediction_pyspark_spark.sources import pysource

    pysource.register_sink(spark)
    d = str(tmp_path / "t5")
    _feed_df(spark, 4).write.format("staged_json").option("path", d).mode("append").save()
    foreign = os.path.join(d, "_staging", "other-writer")
    os.makedirs(foreign)
    with open(os.path.join(foreign, "part-foreign.jsonl"), "w") as f:
        f.write('{"obs_id": 999}\n')
    with pytest.raises(Exception, match="injected failure"):
        (
            _feed_df(spark, 50)
            .write.format("staged_json")
            .option("path", d)
            .option("fail_on", "25")
            .mode("append")
            .save()
        )
    # the concurrent writer's staged file is untouched
    assert os.path.exists(os.path.join(foreign, "part-foreign.jsonl"))
    # and the failed statement's own staging namespaces are gone
    others = [n for n in os.listdir(os.path.join(d, "_staging")) if n != "other-writer"]
    assert others == []


def test_staged_sink_crash_before_manifest_rename_keeps_old_table(tmp_path, monkeypatch):
    """The ADVICE-r5 medium: in overwrite mode the sweep of old data
    files must happen AFTER the new manifest's atomic rename. Simulate
    a crash exactly at the rename — the old manifest must still
    reference files that all exist."""
    import json as _json
    import os

    import pytest

    from nyc_taxi_data_prediction_pyspark_spark.sources.pysource import (
        _StagedJsonWriter,
        read_manifest,
    )

    d = str(tmp_path / "t6")
    os.makedirs(d)
    with open(os.path.join(d, "part-old.jsonl"), "w") as f:
        f.write('{"obs_id": 1}\n')
    with open(os.path.join(d, "_MANIFEST.json"), "w") as f:
        _json.dump({"files": [{"file": "part-old.jsonl", "rows": 1}], "total_rows": 1}, f)

    class _FakeRow:
        def __init__(self, **kw):
            self._kw = kw

        def asDict(self):
            return self._kw

    w = _StagedJsonWriter({"path": d}, overwrite=True)
    msg = w.write(iter([_FakeRow(obs_id=2)]))

    real_replace = os.replace

    def crash_at_manifest(src, dst):
        if str(dst).endswith("_MANIFEST.json"):
            raise RuntimeError("simulated crash at manifest rename")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crash_at_manifest)
    with pytest.raises(RuntimeError, match="simulated crash"):
        w.commit([msg])
    monkeypatch.setattr(os, "replace", real_replace)

    m = read_manifest(d)
    assert m["total_rows"] == 1
    for e in m["files"]:  # every file the live manifest references exists
        assert os.path.exists(os.path.join(d, e["file"])), e
