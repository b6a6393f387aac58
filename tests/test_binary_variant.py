"""binaryFile media source + Spark-4 Variant JSON path + hypothesis
property tests for the cleaning/merge contracts."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.functions.json import parse_variant, variant_get
from nyc_taxi_data_prediction_pyspark_spark.operators import multimodal
from nyc_taxi_data_prediction_pyspark_spark.operators.cleaning import clean_trips


def test_read_media_dir_binary_file(spark, tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x00\x01payload-a")
    (d / "b.bin").write_bytes(b"payload-b-longer-content")
    media = multimodal.read_media_dir(spark, str(d), glob="*.bin", mime="application/x-test")
    rows = {r["source_path"].split("/")[-1]: r for r in media.collect()}
    assert rows["a.bin"]["meta"]["n_bytes"] == 11
    assert bytes(rows["b.bin"]["payload"]) == b"payload-b-longer-content"
    decoded = multimodal.decode_media(media.drop("source_path"))
    assert decoded.count() == 2


def test_variant_parse_and_get(spark):
    df = spark.createDataFrame([('{"a": {"b": [1, 2, 3]}, "t": 4.5}',)], "j string")
    out = df.select(
        variant_get(parse_variant("j"), "$.a.b[1]", "int").alias("b1"),
        variant_get(parse_variant("j"), "$.t", "double").alias("t"),
    ).first()
    assert out["b1"] == 2 and out["t"] == 4.5


# ---------------------------------------------------------------- property

finite = st.floats(allow_nan=False, allow_infinity=False, width=32)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),               # null-mask selector
            st.integers(1, 300),             # zone
            finite,                          # distance
            finite,                          # amount
        ),
        min_size=1,
        max_size=30,
    )
)
def test_cleaning_invariants(spark_h, rows):
    """Post-clean invariants hold for arbitrary inputs: no NULL keys,
    strictly positive measures, schema fixed."""
    t0 = dt.datetime(2026, 1, 1)
    data = [
        (
            None if mask == 1 else t0,
            None if mask == 2 else t0,
            None if mask == 3 else zone,
            zone,
            1.0,
            float(dist),
            float(amt),
        )
        for mask, zone, dist, amt in rows
    ]
    df = spark_h.createDataFrame(
        data,
        "tpep_pickup_datetime timestamp, tpep_dropoff_datetime timestamp, "
        "PULocationID long, DOLocationID long, passenger_count double, "
        "trip_distance double, total_amount double",
    )
    out = clean_trips(df).collect()
    for r in out:
        assert r["pickup_datetime"] is not None and r["dropoff_datetime"] is not None
        assert r["pickup_zone_id"] is not None and r["dropoff_zone_id"] is not None
        assert r["trip_distance"] > 0 and r["total_amount"] > 0


@pytest.fixture(scope="session")
def spark_h(spark):
    return spark
