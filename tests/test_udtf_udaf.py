"""Python UDTF (LATERAL tokenize-with-offsets) and pandas UDAF
(grouped-agg weighted mean) — the §2.10 custom-function surface."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.functions import udtfs
from nyc_taxi_data_prediction_pyspark_spark.operators import aggregates as agg


def test_udtf_offsets_are_cumulative(spark):
    udtfs.register(spark)
    spark.createDataFrame([(1, "ab cd e")], "doc_id long, text string").createOrReplaceTempView(
        "one_doc"
    )
    rows = spark.sql(
        "SELECT t.pos, t.token, t.char_offset FROM one_doc, LATERAL tokenize_offsets(text) t"
    ).collect()
    got = [(r["pos"], r["token"], r["char_offset"]) for r in rows]
    assert got == [(1, "ab", 0), (2, "cd", 3), (3, "e", 6)]
    # offsets index back into the original string
    text = "ab cd e"
    assert all(text[o : o + len(tok)] == tok for _, tok, o in got)


def test_udtf_null_text_yields_no_rows(spark):
    udtfs.register(spark)
    spark.createDataFrame([(1, None)], "doc_id long, text string").createOrReplaceTempView(
        "null_doc"
    )
    assert (
        spark.sql("SELECT t.* FROM null_doc, LATERAL tokenize_offsets(text) t").count() == 0
    )


def test_pandas_udaf_matches_exact_decimal_formula(spark, sf_dir):
    """Decimal-exact UDAF vs dsum(w*v)/dsum(w): since the UDAF now
    quantizes+sums exactly, the match is bit-for-bit (and q70 carries
    a full DuckDB value-hash oracle on top of this contract)."""
    from nyc_taxi_data_prediction_pyspark_spark.catalog import load

    from nyc_taxi_data_prediction_pyspark_spark.functions.udafs import weighted_mean

    ev = load(spark, sf_dir, "events").withColumn("w", F.hour("ts") + F.lit(1.0))
    got = {
        r["event_type"]: r["wmean_value"]
        for r in ev.groupBy("event_type")
        .agg(weighted_mean(F.col("value"), F.col("w")).alias("wmean_value"))
        .collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(
            (agg.dsum(F.col("w") * F.col("value"), 6) / agg.dsum("w", 6)).alias("exact")
        )
        .collect()
    }
    assert set(got) == set(exact) and len(got) > 0
    for k in got:
        assert got[k] == exact[k], (k, got[k], exact[k])
