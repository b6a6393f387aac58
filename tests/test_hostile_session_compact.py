"""Hostile-session recovery (the driver may hand us an arbitrarily
configured SparkSession) and warehouse small-file compaction."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.catalog import load
from nyc_taxi_data_prediction_pyspark_spark.sources.warehouse import Warehouse

HOSTILE = {
    "spark.sql.session.timeZone": "America/New_York",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.legacy.parquet.nanosAsLong": "false",
}


def test_load_recovers_hostile_session_confs(spark, sf_dir):
    """Every correctness-bearing conf must be re-asserted by load():
    a non-UTC timezone or a disabled nanos bridge silently corrupts
    every timestamp comparison downstream."""
    pinned = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    try:
        for k, v in HOSTILE.items():
            spark.conf.set(k, v)
        ev = load(spark, sf_dir, "events")  # must pin_session internally
        for k, v in pinned.items():
            assert spark.conf.get(k) == v, k
        # nanos timestamps actually readable and µs-truncation-correct vs DuckDB
        got = ev.agg(F.min("ts").alias("lo")).collect()[0]["lo"]
        want = duckdb.sql(
            f"SELECT CAST(MIN(ts) AS TIMESTAMP) FROM '{sf_dir}/events.parquet'"
        ).fetchone()[0]
        assert got == want
    finally:
        for k, v in pinned.items():
            spark.conf.set(k, v)


def test_compact_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    wh.ensure("events_t", ev, load_ts=False)
    # simulate micro-batch ingest: many small appends → many files
    for i in range(6):
        wh.append("events_t", ev.where(F.col("event_id") % 6 == i), load_ts=False)
    import glob, os

    before = len(glob.glob(os.path.join(wh.path("events_t"), "part-*")))
    n_rows = wh.read("events_t").count()
    checksum = wh.read("events_t").agg(F.sum("event_id")).collect()[0][0]

    n_files = wh.compact("events_t", target_files=2, sort_by=["ts"])
    assert n_files <= 2 < before
    assert wh.read("events_t").count() == n_rows
    assert wh.read("events_t").agg(F.sum("event_id")).collect()[0][0] == checksum
    # sorted-within-file: each file's rows are ts-ordered (min/max skip envelope)
    part = wh.read("events_t").withColumn("f", F.input_file_name())
    from pyspark.sql import Window as W

    w = W.partitionBy("f").orderBy(F.monotonically_increasing_id())
    disorder = (
        part.withColumn("prev", F.lag("ts").over(w))
        .where(F.col("prev") > F.col("ts"))
        .count()
    )
    assert disorder == 0


def test_fold_query_survives_hostile_session(spark, sf_dir):
    """q173's ledger fold rides µs timestamp arithmetic + the nanos
    bridge: run it under a hostile session (wrong TZ, AQE off, nanos
    bridge off) and it must still value-match DuckDB — load() pins the
    session back, or every boundary comparison drifts."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
    import __spark_entry__ as entry

    pinned = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    try:
        for k, v in HOSTILE.items():
            spark.conf.set(k, v)
        got = sorted(
            map(tuple, entry.q173_credit_ledger(spark, sf_dir).collect())
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
        )
        want = sorted(map(tuple, con.execute(
            entry.oracle_sql()["q173_credit_ledger"]
        ).fetchall()))
        assert got == want
    finally:
        for k, v in pinned.items():
            spark.conf.set(k, v)


def test_round11_head_queries_survive_hostile_session(spark, sf_dir):
    """Round-11 head hardening: the driver takes its FIRST rows on
    q251-q299 (plus the q240 retry) this round, so run the head's
    timestamp-heavy members under the hostile session (wrong TZ, AQE
    off, nanos bridge off) and require exact DuckDB value parity —
    same contract the q173 canary pins for the pre-round-7 surface."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as entry

    pinned = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    names = [
        "q251_window_funnel",
        "q252_cohort_retention",
        "q272_max_concurrency",
    ]
    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    try:
        for name in names:
            for k, v in HOSTILE.items():
                spark.conf.set(k, v)
            got_df = qs[name](spark, sf_dir)
            cols = sorted(got_df.columns)
            got = sorted(
                map(tuple, got_df.select(*cols).collect())
            )
            want_rows = con.execute(oracles[name]).fetchall()
            want_cols = [d[0] for d in con.description]
            order = [want_cols.index(c) for c in cols]
            want = sorted(tuple(r[i] for i in order) for r in want_rows)
            assert got == want, name
            assert got, name  # empty output would pass vacuously
    finally:
        for k, v in pinned.items():
            spark.conf.set(k, v)


def test_round11_head_values_invariant_to_shuffle_partition_count(spark, sf_dir):
    """Partition-count invariance — the determinism claim the decimal-
    sum (dsum) discipline exists to guarantee: a driver session may
    run with ANY spark.sql.shuffle.partitions (its default is 200,
    ours 32), so float-order-sensitive aggregation would hash-mismatch
    intermittently.  Run the ln-heavy round-11 head members (the q240
    failure class: transcendental on data-derived doubles feeding
    round-6) at 7 and 200 shuffle partitions and require bit-identical
    collected values."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as entry

    names = [
        "q240_woe_iv",
        "q275_js_divergence",
        "q282_fightin_words",
        "q294_mutual_information",
        "q296_heaps_law",
    ]
    qs = entry.queries()
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    orig_coalesce = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled", "true"
    )
    try:
        results = {}
        for parts in ("7", "200"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            # keep AQE from coalescing both settings to the same
            # effective partition count at this tiny SF — the test
            # must exercise genuinely different partitionings
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled", "false"
            )
            for name in names:
                df = qs[name](spark, sf_dir)
                cols = sorted(df.columns)
                results.setdefault(name, []).append(
                    sorted(map(tuple, df.select(*cols).collect()))
                )
        for name, (a, b) in results.items():
            assert a == b, f"{name}: values depend on shuffle partition count"
            assert a, f"{name}: empty result makes the invariance vacuous"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", orig_coalesce
        )


def test_round12_head_queries_survive_hostile_session(spark, sf_dir):
    """Round-12 head hardening: q301-q304 take FIRST driver rows this
    round, and q301/q303 are the sharpest hostile-TZ candidates in the
    batch (dayofweek/hour bucketing — a non-UTC session TZ shifts both
    unless catalog.load's pin_session recovers UTC).  Same exact-
    parity contract as the round-11 sibling above."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as entry

    pinned = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    names = [
        "q301_decision_stump",
        "q303_simpsons_reversal",
        "q304_t_closeness",
    ]
    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    try:
        for name in names:
            for k, v in HOSTILE.items():
                spark.conf.set(k, v)
            got_df = qs[name](spark, sf_dir)
            cols = sorted(got_df.columns)
            got = sorted(map(tuple, got_df.select(*cols).collect()))
            want_rows = con.execute(oracles[name]).fetchall()
            want_cols = [d[0] for d in con.description]
            order = [want_cols.index(c) for c in cols]
            want = sorted(tuple(r[i] for i in order) for r in want_rows)
            assert got == want, name
            assert got, name  # empty output would pass vacuously
    finally:
        for k, v in pinned.items():
            spark.conf.set(k, v)


def test_round12_head_values_invariant_to_shuffle_partition_count(spark, sf_dir):
    """Partition-count invariance for the round-12 registrations whose
    outputs carry IEEE divisions (q301's gini, q302's greedy over a
    checkpointed shingle frame): bit-identical at 7 vs 200 shuffle
    partitions, AQE coalescing off (the round-11 discipline)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as entry

    names = ["q301_decision_stump", "q302_coverage_greedy"]
    qs = entry.queries()
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    orig_coalesce = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled", "true"
    )
    try:
        results = {}
        for parts in ("7", "200"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled", "false"
            )
            for name in names:
                df = qs[name](spark, sf_dir)
                cols = sorted(df.columns)
                results.setdefault(name, []).append(
                    sorted(map(tuple, df.select(*cols).collect()))
                )
        for name, (a, b) in results.items():
            assert a == b, f"{name}: values depend on shuffle partition count"
            assert a, f"{name}: empty result makes the invariance vacuous"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", orig_coalesce
        )
