"""Error-path parity: FAILFAST bulk-load abort (the reference's
ON_ERROR='ABORT_STATEMENT', etl_spark_historical.py:295) and
stream-static dim joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nyc_taxi_data_prediction_pyspark_spark.catalog import load
from nyc_taxi_data_prediction_pyspark_spark.sources import csv_io


def test_failfast_csv_aborts_on_malformed_row(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-000.csv").write_text("k,v\n1,2.5\nnot_a_number,oops\n3,4.5\n")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    with pytest.raises(Exception) as ei:
        csv_io.read_csv(spark, str(p), schema).collect()
    msg = str(ei.value)
    # ANSI sessions abort in the cast itself; non-ANSI sessions hit the
    # explicit raise_error guard — both are ABORT_STATEMENT parity
    assert "read_csv abort" in msg or "CAST_INVALID_INPUT" in msg or "Malformed" in msg


def test_lowercase_null_literal_accepted(spark, tmp_path):
    """The reference's NULL_IF covers '', 'NULL' and 'null' — a
    lowercase null in a typed column must load as NULL, not abort."""
    p = tmp_path / "lcnull"
    p.mkdir()
    (p / "part-000.csv").write_text("k,v\n1,null\n2,\n3,7.5\n")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    rows = {r["k"]: r["v"] for r in csv_io.read_csv(spark, str(p), schema).collect()}
    assert rows == {1: None, 2: None, 3: 7.5}


def test_failfast_csv_reads_clean_file(spark, tmp_path):
    p = tmp_path / "good"
    p.mkdir()
    (p / "part-000.csv").write_text('k,v\n1,2.5\n2,NULL\n')
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    rows = {r["k"]: r["v"] for r in csv_io.read_csv(spark, str(p), schema).collect()}
    assert rows == {1: 2.5, 2: None}  # NULL literal → NULL (S6 parity)


def test_stream_static_broadcast_join(spark, sf_dir, tmp_path):
    """Streaming events enriched with a static dim (broadcast) — the
    streaming face of J2's dim join."""
    import uuid

    from nyc_taxi_data_prediction_pyspark_spark.streaming import pipeline as stream

    events = stream.read_event_stream(spark, sf_dir, glob="events.parquet")
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 5.0), ("signup", 2.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    joined = events.join(F.broadcast(dim), "event_type")
    sink = f"t_ss_{uuid.uuid4().hex[:6]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_stream = spark.table(sink).count()
    assert n_stream == load(spark, sf_dir, "events").count()
