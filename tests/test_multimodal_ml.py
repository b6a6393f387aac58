"""Multimodal column plumbing + MLlib pipelines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.catalog import load
from nyc_taxi_data_prediction_pyspark_spark.ml.embeddings import EMB_DIM, with_embeddings
from nyc_taxi_data_prediction_pyspark_spark.ml.forecast import fit_demand_model, predict_demand
from nyc_taxi_data_prediction_pyspark_spark.operators import multimodal
from nyc_taxi_data_prediction_pyspark_spark.schemas import MEDIA, conforms


def test_attach_binary_schema(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    media = multimodal.attach_binary(docs, src_col="text", id_col="doc_id", mime="text/plain")
    assert conforms(media.schema, MEDIA) == []
    row = media.first()
    assert row["meta"]["n_bytes"] == len(bytes(row["payload"]))


def test_decode_media_batch_shape(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(20)
    media = multimodal.attach_binary(docs, src_col="text", id_col="doc_id", mime="text/plain")
    decoded = multimodal.decode_media(media)
    rows = decoded.collect()
    assert len(rows) == 20
    assert all(len(r["feature"]) == 4 for r in rows)
    assert all(r["width"] >= 1 and r["height"] >= 1 for r in rows)


def test_resize_is_explicit_stub(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(1)
    media = multimodal.attach_binary(docs, src_col="text", id_col="doc_id", mime="text/plain")
    with pytest.raises(NotImplementedError):
        multimodal.resize_stub(media, 64, 64)


def test_media_stats_totals(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    media = multimodal.attach_binary(docs, src_col="text", id_col="doc_id", mime="text/plain")
    stats = multimodal.media_stats(media).first()
    assert stats["n_media"] == docs.count()
    assert stats["total_bytes"] > 0


def test_embeddings_deterministic(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(10).select("doc_id", "text")
    e1 = {r["doc_id"]: r["embedding"] for r in with_embeddings(docs).collect()}
    e2 = {r["doc_id"]: r["embedding"] for r in with_embeddings(docs).collect()}
    assert e1 == e2
    assert all(len(v) == EMB_DIM for v in e1.values())


def test_forecast_pipeline_predicts(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    preds = predict_demand(events)
    assert preds.count() > 0
    assert preds.where(F.col("prediction").isNull()).count() == 0


def test_grouped_linear_fit_closed_form_matches_numpy(spark, sf_dir):
    """The decimal-exact closed form (q68, oracle-checked) and the
    applyInPandas/numpy lstsq variant must agree to float tolerance —
    the contract that licenses swapping in arbitrary per-group Python
    models behind the same interface."""
    import math

    from nyc_taxi_data_prediction_pyspark_spark.catalog import load
    from nyc_taxi_data_prediction_pyspark_spark.ml import forecast

    ev = load(spark, sf_dir, "events").withColumn("x_hour", F.hour("ts"))
    exact = {
        r["event_type"]: r
        for r in forecast.grouped_linear_fit(
            ev, group="event_type", x="x_hour", y="value"
        ).collect()
    }
    pandas_fit = {
        r["event_type"]: r
        for r in forecast.grouped_linear_fit_pandas(
            ev, group="event_type", x="x_hour", y="value"
        ).collect()
    }
    assert set(exact) == set(pandas_fit) and len(exact) > 0
    for k, e in exact.items():
        p = pandas_fit[k]
        assert p["n_obs"] == e["n_obs"]
        assert math.isclose(p["slope"], e["slope"], rel_tol=1e-6, abs_tol=1e-9)
        assert math.isclose(p["intercept"], e["intercept"], rel_tol=1e-6, abs_tol=1e-9)
