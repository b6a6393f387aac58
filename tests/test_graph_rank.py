"""Fixed-point PageRank (operators/graph.py) and the two-phase grouped
rank / closed-form ntile (operators/windows.py) — the round-2 additions
that make iterative and skewed-group algorithms oracle-checkable."""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from nyc_taxi_data_prediction_pyspark_spark.catalog import load
from nyc_taxi_data_prediction_pyspark_spark.operators import graph, windows


def _pagerank_reference(edges, iters=3, damping_pct=85):
    """Driver-side integer recurrence — the spec the DataFrame loop
    must match exactly."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    n = len(nodes)
    base = graph.SCALE // n
    tel = ((100 - damping_pct) * base) // 100
    pr = {v: base for v in nodes}
    for _ in range(iters):
        recv = {v: 0 for v in nodes}
        for u, v in edges:
            recv[v] += pr[u] // out[u]
        pr = {v: tel + (damping_pct * recv[v]) // 100 for v in nodes}
    return pr


def test_pagerank_matches_integer_reference(spark):
    edges = [
        ("a", "b"), ("b", "a"),          # 2-cycle
        ("a", "c"), ("c", "a"),
        ("c", "d"), ("d", "c"),
        ("b", "d"), ("d", "b"),
        ("e", "a"), ("a", "e"),          # pendant on the hub
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank_fixedpoint(df, iters=3).collect()
    }
    assert got == _pagerank_reference(edges, iters=3)


def test_pagerank_symmetric_graph_conserves_mass(spark):
    # symmetric edges ⇒ no dangling nodes ⇒ only floor-rounding loss:
    # strictly less than 1 pico-unit per node per division step.
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    total = (
        graph.pagerank_fixedpoint(df, iters=3)
        .agg(F.sum("pr").alias("t"))
        .collect()[0]["t"]
    )
    n, iters, steps_per_iter = 3, 3, 3  # base div, pr div deg, two div-100s
    assert total <= graph.SCALE
    assert total >= graph.SCALE - n * iters * steps_per_iter * 100


def _ppr_reference(edges, sources, iters=3, damping_pct=85):
    """Driver-side integer personalized-PageRank recurrence."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges} | set(sources))
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    s = set(sources)
    base = graph.SCALE // len(s)
    tel = ((100 - damping_pct) * base) // 100
    pr = {v: (base if v in s else 0) for v in nodes}
    for _ in range(iters):
        recv = {v: 0 for v in nodes}
        for u, v in edges:
            recv[v] += pr[u] // out[u]
        pr = {
            v: (tel if v in s else 0) + (damping_pct * recv[v]) // 100 for v in nodes
        }
    return pr


def test_personalized_pagerank_matches_integer_reference(spark):
    edges = [
        ("a", "b"), ("b", "a"),
        ("a", "c"), ("c", "a"),
        ("c", "d"), ("d", "c"),
        ("b", "d"), ("d", "b"),
        ("e", "a"), ("a", "e"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    srcs = spark.createDataFrame([("a",), ("e",)], ["node"])
    got = {
        r["node"]: r["pr"]
        for r in graph.personalized_pagerank(df, srcs, iters=3).collect()
    }
    assert got == _ppr_reference(edges, ["a", "e"], iters=3)


def test_personalized_pagerank_isolated_seed_keeps_teleport_mass(spark):
    """A seed with no edges still appears with exactly its teleport
    share each round — the union-into-nodes contract."""
    edges = [("a", "b"), ("b", "a")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    srcs = spark.createDataFrame([("z",)], ["node"])  # not in the graph
    got = {
        r["node"]: r["pr"]
        for r in graph.personalized_pagerank(df, srcs, iters=2).collect()
    }
    ref = _ppr_reference(edges, ["z"], iters=2)
    assert got == ref
    tel = ((100 - 85) * (graph.SCALE // 1)) // 100
    assert got["z"] == tel  # teleport only: z receives no link mass
    assert got["a"] == 0 and got["b"] == 0  # no mass ever reaches the graph


def test_grouped_rank_two_phase_equals_single_window(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "value")
    two = windows.grouped_rank_two_phase(
        ev, ["user_id"], ["value", "event_id"], out_col="rk", num_partitions=7
    )
    one = windows.grouped_rank_two_phase(
        ev, ["user_id"], ["value", "event_id"], out_col="rk", two_phase=False
    )
    assert two.select("event_id", "rk").exceptAll(one.select("event_id", "rk")).count() == 0
    assert one.select("event_id", "rk").exceptAll(two.select("event_id", "rk")).count() == 0


def test_grouped_rank_group_size_col_matches_groupby(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "event_id")
    ranked = windows.grouped_rank_two_phase(
        ev, ["user_id"], ["event_id"], out_col="rk", group_size_col="n", num_partitions=5
    )
    got = {
        r["user_id"]: r["n"]
        for r in ranked.select("user_id", "n").distinct().collect()
    }
    want = {
        r["user_id"]: r["c"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert got == want
    # and the max rank per group IS the group size
    mx = {
        r["user_id"]: r["m"]
        for r in ranked.groupBy("user_id").agg(F.max("rk").alias("m")).collect()
    }
    assert mx == want


def test_ntile_from_rank_equals_window_ntile(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "event_id")
    w = W.partitionBy("user_id").orderBy("event_id")
    native = ev.withColumn("t", F.ntile(5).over(w))
    sizes = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    closed = (
        ev.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .join(sizes, "user_id")
        .withColumn("t", windows.ntile_from_rank("rk", "n", 5))
    )
    diff = (
        native.select("event_id", "t")
        .exceptAll(closed.select("event_id", "t"))
        .count()
    )
    assert diff == 0


def test_ntile_from_rank_tiny_groups(spark):
    # n < k: every row is its own bucket (ntile gives buckets of ≤1 row)
    rows = [("g1", 1, 2), ("g1", 2, 2), ("g2", 1, 1)]
    df = spark.createDataFrame(rows, ["g", "rk", "n"])
    got = {
        (r["g"], r["rk"]): r["t"]
        for r in df.withColumn("t", windows.ntile_from_rank("rk", "n", 3)).collect()
    }
    assert got == {("g1", 1): 1, ("g1", 2): 2, ("g2", 1): 1}
