"""Structured Streaming variants (T1-T6): availableNow windowed agg
equals batch; foreachBatch merge is idempotent; stream dedup."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.catalog import load
from nyc_taxi_data_prediction_pyspark_spark.operators.merge import merge_upsert
from nyc_taxi_data_prediction_pyspark_spark.streaming import pipeline as stream


def test_streaming_hourly_equals_batch(spark, sf_dir, tmp_path):
    events = stream.read_event_stream(spark, sf_dir, glob="events.parquet")
    counts = stream.windowed_counts(events)
    sink = f"t_stream_{uuid.uuid4().hex[:6]}"
    stream.run_available_now(
        counts, checkpoint=str(tmp_path / "ckpt"), sink_table=sink, output_mode="complete"
    )
    got = spark.table(sink)
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0


def test_stream_dedup_drops_duplicate_keys(spark, sf_dir, tmp_path):
    events = stream.read_event_stream(spark, sf_dir, glob="events.parquet")
    # duplicate the stream by unioning it with itself, then dedup on event_id
    doubled = events.union(events)
    deduped = stream.dedup_stream(doubled, ["event_id"])
    sink = f"t_dedup_{uuid.uuid4().hex[:6]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_src = load(spark, sf_dir, "events").count()
    assert spark.table(sink).count() == n_src


def test_streaming_session_window(spark, sf_dir, tmp_path):
    """Built-in session_window (gap-based) in a streaming agg — the
    streaming face of operators/windows.sessionize."""
    import uuid

    events = stream.read_event_stream(spark, sf_dir, glob="events.parquet")
    sessions = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    sink = f"t_sess_{uuid.uuid4().hex[:6]}"
    q = (
        sessions.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "cksw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(sink)
    # session totals must re-aggregate to the per-user event counts
    per_user = got.groupBy("user_id").agg(F.sum("n_events").alias("n"))
    batch = load(spark, sf_dir, "events").groupBy("user_id").count()
    j = per_user.join(batch, "user_id").where(F.col("n") != F.col("count"))
    assert j.count() == 0


def test_foreach_batch_merge_idempotent(spark, sf_dir, tmp_path):
    """T6: re-processing the same batch through the merge sink leaves
    the table unchanged (effective exactly-once)."""
    state = {"fact": load(spark, sf_dir, "events").limit(0).select("event_id", "event_type")}

    def do_merge(batch_df, epoch_id):
        stg = batch_df.select("event_id", "event_type")
        state["fact"] = merge_upsert(stg, state["fact"], ["event_id"]).localCheckpoint()

    events = stream.read_event_stream(spark, sf_dir, glob="events.parquet")
    stream.foreach_batch_merge(events, checkpoint=str(tmp_path / "ck3"), merge_fn=do_merge)
    n1 = state["fact"].count()
    # replay the same data through the merge again (simulated redelivery)
    do_merge(load(spark, sf_dir, "events"), 99)
    assert state["fact"].count() == n1 == load(spark, sf_dir, "events").count()


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream interval join (append mode) must
    produce exactly the pairs the equivalent batch range-join does."""
    types = sorted(
        r["event_type"]
        for r in load(spark, sf_dir, "events").select("event_type").distinct().collect()
    )[:2]

    def sides(df):
        left = df.where(F.col("event_type") == types[0]).select(
            F.col("event_id").alias("l_id"), F.col("user_id").alias("l_user"), F.col("ts").alias("l_ts")
        )
        right = df.where(F.col("event_type") == types[1]).select(
            F.col("event_id").alias("r_id"), F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts")
        )
        return left, right

    sl, sr = sides(stream.read_event_stream(spark, sf_dir, glob="events.parquet"))
    joined = stream.stream_stream_join(
        sl.withColumnRenamed("l_user", "user_id"),
        sr.withColumnRenamed("r_user", "user_id"),
        key="user_id",
        left_ts="l_ts",
        right_ts="r_ts",
        within="1 hour",
    ).select("l_id", "r_id")
    sink = f"t_ssj_{uuid.uuid4().hex[:6]}"
    stream.run_available_now(
        joined, checkpoint=str(tmp_path / "ckpt_ssj"), sink_table=sink, output_mode="append"
    )
    got = spark.table(sink)

    bl, br = sides(load(spark, sf_dir, "events"))
    batch = bl.join(
        br,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("l_id", "r_id")
    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0


def test_incremental_corpus_ingest_batch_boundary_invariant(spark, sf_dir, tmp_path):
    """The fingerprint store must equal batch dedup (q13's keep
    mapping) for ANY arrival split — 2 files vs 5 files vs one-shot —
    because the per-key merge is MIN (idempotent + commutative)."""
    from nyc_taxi_data_prediction_pyspark_spark.catalog import load
    from nyc_taxi_data_prediction_pyspark_spark.operators.text import fingerprint

    def run(n):
        out = stream.ingest_corpus_incrementally(
            spark, sf_dir, str(tmp_path / f"ingest_{n}"), n_arrival_files=n
        )
        return {(r["doc_fp"], r["keep_id"]) for r in out.collect()}

    batch = {
        (r["doc_fp"], r["keep_id"])
        for r in fingerprint(load(spark, sf_dir, "documents"))
        .groupBy("doc_fp")
        .agg(F.min("doc_id").alias("keep_id"))
        .collect()
    }
    assert run(2) == batch
    assert run(5) == batch


def test_event_stream_reads_both_ns_and_us_parquet(spark, tmp_path):
    """The driver's testdata generator has shipped events.ts as BOTH
    TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across rounds; the stream
    reader must sniff the footer and produce identical TimestampType
    rows either way (the regression that broke q22/q108/q114 when the
    unit flipped)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = {
        "event_id": [1, 2, 3],
        "ts": [
            dt.datetime(2024, 1, 1, 0, 10),
            dt.datetime(2024, 1, 1, 1, 20),
            dt.datetime(2024, 1, 1, 1, 40),
        ],
        "user_id": [7, 7, 8],
        "event_type": ["view", "click", "view"],
        "value": [1.0, 2.0, 3.0],
        "props": ["{}", "{}", "{}"],
    }
    got = {}
    for unit in ("ns", "us"):
        d = tmp_path / unit
        d.mkdir()
        schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp(unit)),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pydict(rows, schema=schema), d / "events.parquet")
        assert stream.events_ts_unit(str(d), "events.parquet") == unit
        ev = stream.read_event_stream(spark, str(d), glob="events.parquet")
        counts = stream.windowed_counts(ev)
        sink = f"t_unit_{unit}_{uuid.uuid4().hex[:6]}"
        stream.run_available_now(
            counts,
            checkpoint=str(tmp_path / f"ckpt_{unit}"),
            sink_table=sink,
            output_mode="complete",
        )
        got[unit] = {tuple(r) for r in spark.table(sink).collect()}
    assert got["ns"] == got["us"] and len(got["us"]) == 3


def test_ingest_embeddings_incrementally_matches_batch_and_split_invariant(spark, tmp_path):
    """The streaming semantic-dedup store must equal the batch drop
    rule (lower-id bucket-mate at cosine >= t) regardless of arrival
    splits — including the retroactive case where a late lower id
    flips an already-stored survivor."""
    from nyc_taxi_data_prediction_pyspark_spark.functions.vectors import as_double, cosine
    from nyc_taxi_data_prediction_pyspark_spark.operators.similarity import (
        lsh_buckets,
        random_hyperplanes,
    )
    from nyc_taxi_data_prediction_pyspark_spark.streaming import pipeline as stream

    sf = "/root/testdata/sf0.001"
    got2 = {
        (r["pid"], r["dropped"])
        for r in stream.ingest_embeddings_incrementally(
            spark, sf, str(tmp_path / "w2"), n_arrival_files=2, threshold=0.35
        ).collect()
    }
    got5 = {
        (r["pid"], r["dropped"])
        for r in stream.ingest_embeddings_incrementally(
            spark, sf, str(tmp_path / "w5"), n_arrival_files=5, threshold=0.35
        ).collect()
    }
    assert got2 == got5  # batch-boundary invariance

    # batch reference: same buckets, same rule, computed in one pass
    from nyc_taxi_data_prediction_pyspark_spark.catalog import load

    emb = load(spark, sf, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    planes = random_hyperplanes(dim, 6, 42)
    v = lsh_buckets(emb, planes).select(
        F.col("vec_id").alias("pid"), "bucket", as_double("embedding").alias("vec")
    )
    a = v.select(F.col("pid").alias("id_a"), "bucket", F.col("vec").alias("va"))
    b = v.select(F.col("pid").alias("id_b"), "bucket", F.col("vec").alias("vb"))
    dropped = {
        r["id_b"]
        for r in a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cosine(F.col("va"), F.col("vb")) >= 0.35)
        .select("id_b")
        .distinct()
        .collect()
    }
    want = {
        (r["pid"], r["pid"] in dropped) for r in v.select("pid").collect()
    }
    assert got2 == want
    assert any(d for _, d in got2)  # the fixture actually has near-dupes


def test_streaming_holt_bit_equals_batch(spark, sf_dir, tmp_path):
    """The incremental state-store fold must be BIT-equal to the batch
    operator for every user — not approximately: the state machine
    replays the identical IEEE-op sequence across batch boundaries."""
    from nyc_taxi_data_prediction_pyspark_spark.operators import windows

    got = {
        r.user_id: (r.n_events, r.level, r.trend, r.forecast_1)
        for r in stream.holt_state_stream(
            spark, sf_dir, str(tmp_path / "holt"), alpha=0.5, beta=0.25,
            n_arrival_files=4,
        ).collect()
    }
    want = {
        r.user_id: (r.n_events, r.level, r.trend, r.forecast_1)
        for r in windows.holt_level_trend(
            load(spark, sf_dir, "events"),
            partition=["user_id"], ts="ts", value_col="value",
            alpha=0.5, beta=0.25, order_tiebreak=["event_id"],
        ).collect()
    }
    assert got == want  # exact, every user, every field

    # Atomic-commit contract (round-6 advice): the applied-batch
    # watermark must live INSIDE the store directory — published by
    # the same rename as the data — never as a separate post-swap
    # file (a crash between two renames would advance the store with
    # a stale watermark and the non-idempotent fold would double-
    # apply the redelivered batch).
    import json as _json
    import os as _os

    store = str(tmp_path / "holt" / "store")
    ledger = _os.path.join(store, "_applied.json")
    assert _os.path.exists(ledger), "watermark must ride inside the store dir"
    with open(ledger) as fh:
        wm = _json.load(fh)["watermark"]
    assert wm == 3  # 4 arrival files -> last batch id 3
    assert not _os.path.exists(str(tmp_path / "holt" / "applied.json"))
    # and the underscore name is invisible to the parquet reader
    assert spark.read.parquet(store).count() > 0


def test_hll_streaming_ingest_lands_on_batch_fixpoint(spark, tmp_path):
    """Register-wise MAX is idempotent/commutative/monotone: the
    streamed store's estimate must EQUAL the batch sketch exactly,
    whatever the arrival split."""
    from nyc_taxi_data_prediction_pyspark_spark.catalog import load
    from nyc_taxi_data_prediction_pyspark_spark.operators import aggregates as agg
    from nyc_taxi_data_prediction_pyspark_spark.streaming import pipeline as stream

    sf = "/root/testdata/sf0.001"
    streamed = stream.hll_streaming_ingest(
        spark, sf, str(tmp_path / "hll"), group_keys=("event_type",),
        value_col="user_id", p=9, n_arrival_files=3,
    ).collect()
    ev = load(spark, sf, "events")
    batch = (
        agg.hll_distinct(ev, group_keys=["event_type"], value_col="user_id", p=9)
        .orderBy("event_type")
        .collect()
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]
