"""Coverage for the small API-surface helpers that no headline query
routes through — they are part of the engine's public surface
(SimHash distance compare, set-op variants, JSON serialize, L2
metric, inspection sample), so each gets a behavioral pin here."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from nyc_taxi_data_prediction_pyspark_spark.functions.json import to_json_string
from nyc_taxi_data_prediction_pyspark_spark.functions.vectors import as_double, l2_distance
from nyc_taxi_data_prediction_pyspark_spark.operators import dedup, setops, topk


def test_hamming64_pairs_simhash_signatures(spark, sf_dir):
    """The SimHash consumer path: near-dup candidates = signature
    pairs within Hamming distance k (bit_count of XOR, JVM built-in)."""
    from nyc_taxi_data_prediction_pyspark_spark.catalog import load

    docs = load(spark, sf_dir, "documents").limit(100)
    sig = dedup.simhash(docs, text_col="text", id_col="doc_id", bits=60, stable=True)
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sig_a"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sig_b"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("dist", dedup.hamming64("sig_a", "sig_b"))
        .where(F.col("dist") <= 12)
    )
    for r in pairs.limit(20).collect():
        assert bin(r["sig_a"] ^ r["sig_b"]).count("1") == r["dist"] <= 12


def test_except_all_keeps_duplicates_except_distinct_does_not(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], "x int")
    b = spark.createDataFrame([(1,)], "x int")
    assert sorted(r["x"] for r in setops.except_all_rows(a, b).collect()) == [1, 2]
    assert sorted(r["x"] for r in setops.except_distinct(a, b).collect()) == [2]


def test_sample_rows_bounds_output(spark, sf_dir):
    from nyc_taxi_data_prediction_pyspark_spark.catalog import load

    out = topk.sample_rows(load(spark, sf_dir, "orders"), 7)
    assert out.count() == 7


def test_to_json_string_roundtrips(spark):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    s = df.select(to_json_string("k", "v").alias("j")).first()["j"]
    assert s == '{"k":1,"v":"a"}'
    back = spark.createDataFrame([(s,)], "j string").select(
        F.get_json_object("j", "$.v").alias("v")
    )
    assert back.first()["v"] == "a"


def test_l2_distance_matches_math(spark):
    df = spark.createDataFrame([([3.0, 0.0], [0.0, 4.0])], "a array<float>, b array<float>")
    got = df.select(l2_distance(as_double("a"), as_double("b")).alias("d")).first()["d"]
    assert math.isclose(got, 5.0)
