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


def test_frame_sample_real_decode(spark):
    """Frame sampling is a REAL SRV0 parse: sampled frames must be the
    exact payload slices, at the right timestamps, one output row per
    sampled frame (the expanding mapInPandas shape)."""
    vids = multimodal.synthetic_video_table(
        spark, n_videos=5, n_frames=24, width=8, height=6, fps=12
    )
    frames = multimodal.frame_sample(vids, every_ms=500).collect()
    # 24 frames at 12 fps = 2000 ms; samples at 0/500/1000/1500 ms
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["media_id"], []).append(r)
    assert set(len(v) for v in by_vid.values()) == {4}
    payloads = {r["media_id"]: bytes(r["payload"]) for r in vids.collect()}
    for vid, rows in by_vid.items():
        for r in sorted(rows, key=lambda r: r["frame_idx"]):
            assert r["ts_ms"] == r["frame_idx"] * 1000 // 12
            fsz = r["width"] * r["height"]
            start = 10 + r["frame_idx"] * fsz  # SRV0 header is 10 bytes
            assert bytes(r["frame"]) == payloads[vid][start : start + fsz]


def test_resize_frames_nearest_neighbor(spark):
    """Resize is real resampling: a downscaled frame's pixels must be
    the exact nearest-neighbor grid gather of the source frame."""
    import numpy as np

    vids = multimodal.synthetic_video_table(
        spark, n_videos=2, n_frames=4, width=8, height=6, fps=4
    )
    frames = multimodal.frame_sample(vids, every_ms=250)
    small = multimodal.resize_frames(frames, 4, 3)
    src = {(r["media_id"], r["frame_idx"]): r for r in frames.collect()}
    for r in small.collect():
        assert (r["width"], r["height"]) == (4, 3)
        s = src[(r["media_id"], r["frame_idx"])]
        img = np.frombuffer(bytes(s["frame"]), dtype=np.uint8).reshape(6, 8)
        expect = img[np.ix_((np.arange(3) * 6) // 3, (np.arange(4) * 8) // 4)]
        assert bytes(r["frame"]) == expect.tobytes()


def test_audio_features_real_signal_math(spark):
    """Audio features are real windowed DSP: RMS of a sine ≈ A/√2 and
    the FFT band holding the clip's frequency carries the energy."""
    import math

    clips = multimodal.synthetic_audio_table(
        spark, n_clips=3, n_samples=8000, sample_rate=8000
    )
    rows = multimodal.audio_features(clips, window_ms=125).collect()
    # 8000 samples / (125 ms @ 8 kHz = 1000-sample windows) = 8 windows
    by_clip = {}
    for r in rows:
        by_clip.setdefault(r["media_id"], []).append(r)
    assert set(len(v) for v in by_clip.values()) == {8}
    for cid, rs in by_clip.items():
        for r in rs:
            rms, zcr, peak, *bands = r["feature"]
            assert math.isclose(rms, (12000 / 32768) / math.sqrt(2), rel_tol=0.02)
            assert 0 < zcr < 0.5 and 0.3 < peak <= 1.0
            # clip freq is 100-299 Hz -> rfft bin < 38 of 501 -> band 0
            assert bands[0] == max(bands)


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
