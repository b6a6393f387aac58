"""Fixed-point integer k-means (operators/clustering.py): exactness
and convergence properties a library k-means cannot promise."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.catalog import load
from nyc_taxi_data_prediction_pyspark_spark.operators import clustering


def _toy(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_separated_clusters_exact(spark):
    # two tight groups far apart; k=2 seeds = ids 0 and 1 (one in each
    # group) => Lloyd must recover the true partition in one iteration
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.1, -0.1]),
        (3, [9.9, 10.1]),
        (4, [0.05, 0.02]),
        (5, [10.2, 9.8]),
    ]
    got = {
        r["pid"]: r["cluster"]
        for r in clustering.kmeans_fixedpoint(
            _toy(spark, rows), k=2, iters=1
        ).collect()
    }
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}


def test_kmeans_deterministic_rerun(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    a = clustering.kmeans_fixedpoint(emb, k=4, iters=2)
    b = clustering.kmeans_fixedpoint(emb, k=4, iters=2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_kmeans_assignment_is_total_and_bounded(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    a = clustering.kmeans_fixedpoint(emb, k=8, iters=2)
    assert a.count() == n
    rng = a.agg(
        F.min("cluster").alias("lo"),
        F.max("cluster").alias("hi"),
        F.min("d2").alias("d2min"),
    ).first()
    assert 0 <= rng["lo"] and rng["hi"] <= 7 and rng["d2min"] >= 0


def test_kmeans_empty_cluster_keeps_seed_centroid(spark):
    # k=3 with seeds 0,1,2 all inside one tight blob: after the first
    # update two centroids lose every point; the run must still
    # produce a valid assignment (kept centroids, no divide-by-zero)
    rows = [(i, [float(i) / 100.0, 0.0]) for i in range(6)] + [
        (10, [50.0, 50.0]),
        (11, [50.1, 49.9]),
    ]
    a = clustering.kmeans_fixedpoint(_toy(spark, rows), k=3, iters=2)
    got = {r["pid"]: r["cluster"] for r in a.collect()}
    assert len(got) == 8
    # the far blob lands together regardless of which centroid wins it
    assert got[10] == got[11]


def test_kmeans_negative_component_floor_division(spark):
    # centroid mean of -1 and -2 is -1.5 -> floor => -2 (not trunc -1):
    # two points at x=-1,-2 and seed ids 0,1; after one update the
    # surviving behavior must match exact floor semantics. We verify
    # end-to-end: all points assigned, deterministic, and the d2 of a
    # symmetric pair is identical.
    rows = [(0, [-1.0]), (1, [-2.0]), (2, [-1.0]), (3, [-2.0])]
    a = clustering.kmeans_fixedpoint(_toy(spark, rows), k=1, iters=1).collect()
    d2 = {r["pid"]: r["d2"] for r in a}
    # centroid = floor((-1e6 + -2e6 + -1e6 + -2e6) / 4) = -1500000
    assert d2[0] == d2[2] == (1_500_000 - 1_000_000) ** 2
    assert d2[1] == d2[3] == (2_000_000 - 1_500_000) ** 2


# ---- HLL distinct sketch (operators/aggregates.hll_distinct) ----


def test_hll_estimate_accuracy(spark):
    from nyc_taxi_data_prediction_pyspark_spark.operators import aggregates as agg

    n = 20_000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    row = agg.hll_distinct(df, group_keys=["g"], value_col="v", p=9).first()
    # standard error for m=512 is ~1.04/sqrt(512) = 4.6%; allow 3 sigma
    assert abs(row["hll_estimate"] - n) / n < 0.14


def test_hll_registers_merge_by_max(spark):
    from nyc_taxi_data_prediction_pyspark_spark.operators import aggregates as agg

    a = spark.range(0, 5000).select(F.lit("g").alias("g"), F.col("id").cast("string").alias("v"))
    b = spark.range(2500, 8000).select(F.lit("g").alias("g"), F.col("id").cast("string").alias("v"))
    # sketch of the union must equal the sketch of concatenated inputs
    # (register-wise max is associative/commutative/idempotent)
    u1 = agg.hll_distinct(a.union(b), group_keys=["g"], value_col="v", p=9).first()
    u2 = agg.hll_distinct(b.union(a).union(a), group_keys=["g"], value_col="v", p=9).first()
    assert u1["d_scaled"] == u2["d_scaled"] and u1["n_used"] == u2["n_used"]


def test_kmeans_matches_pure_python_reference(spark):
    # independent exact replica of the fixed-point recurrence in plain
    # Python ints — catches any engine-side drift the SQL oracle and
    # the Spark path could share
    import math
    import random

    rng = random.Random(7)
    rows = [
        (i, [round(rng.uniform(-0.6, 0.6), 4) for _ in range(8)])
        for i in range(40)
    ]
    k, iters, quant = 3, 2, 1_000_000

    def q(x):
        return math.floor(float(x) * quant)

    pts = {pid: [q(x) for x in vec] for pid, vec in rows}
    cent = {c: pts[pid] for c, pid in enumerate(sorted(pts)[:k])}

    def assign(cent):
        out = {}
        for pid, v in pts.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, cv)), cid)
                for cid, cv in cent.items()
            )
            out[pid] = best[1]
        return out

    for _ in range(iters):
        a = assign(cent)
        new = {}
        for cid in cent:
            members = [pts[p] for p, c in a.items() if c == cid]
            if not members:
                new[cid] = cent[cid]
                continue
            n = len(members)
            new[cid] = [
                (sum(col) - (sum(col) % n + n) % n) // n
                for col in zip(*members)
            ]
        cent = new
    want = assign(cent)

    got = {
        r["pid"]: r["cluster"]
        for r in clustering.kmeans_fixedpoint(
            _toy(spark, rows), k=k, iters=iters, quant=quant
        ).collect()
    }
    assert got == want


def test_hll_matches_pure_python_reference(spark):
    import hashlib

    from nyc_taxi_data_prediction_pyspark_spark.operators import aggregates as agg

    vals = [str(i * 37) for i in range(3000)]
    p = 9
    m, w = 1 << p, 60 - p
    regs = {}
    for v in vals:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        bkt, rest = h % m, h // m
        rank = (w + 1) if rest == 0 else (w + 1) - rest.bit_length()
        regs[bkt] = max(regs.get(bkt, 0), rank)
    want_used = len(regs)
    want_d = (m - want_used) * (1 << (w + 1)) + sum(
        1 << (w + 1 - r) for r in regs.values()
    )

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    row = agg.hll_distinct(df, group_keys=["g"], value_col="v", p=p).first()
    assert (row["n_used"], row["d_scaled"]) == (want_used, want_d)


def test_kcenter_matches_bruteforce_greedy(spark, sf_dir):
    import math

    emb = load(spark, sf_dir, "embeddings")
    got = [
        (r["step"], r["vec_id"], r["maximin_d2"], r["selected"])
        for r in clustering.kcenter_sample(emb, k=5).collect()
    ]

    pts = {
        r["vec_id"]: [math.floor(float(x) * 1_000_000) for x in r["embedding"]]
        for r in emb.select("vec_id", "embedding").collect()
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    seed = min(pts)
    want = [(1, seed, 0, True)]
    mind = {pid: d2(v, pts[seed]) for pid, v in pts.items() if pid != seed}
    for step in range(2, 6):
        nxt = max(mind, key=lambda p: (mind[p], -p))
        want.append((step, nxt, mind[nxt], True))
        nv = pts[nxt]
        del mind[nxt]
        mind = {p: min(d, d2(pts[p], nv)) for p, d in mind.items()}
    wit = max(mind, key=lambda p: (mind[p], -p))
    want.append((6, wit, mind[wit], False))
    assert got == want


def test_kcenter_maximin_non_increasing_and_distinct(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    rows = clustering.kcenter_sample(emb, k=6).collect()
    assert len(rows) == 7 and rows[-1]["selected"] is False
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == len(ids)
    d2s = [r["maximin_d2"] for r in rows[1:]]  # seed row is 0 by convention
    assert all(a >= b for a, b in zip(d2s, d2s[1:]))


def test_kmeans_separation_consistent_with_assignment(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    sep = clustering.kmeans_separation(emb, k=4, iters=1).collect()
    asg = clustering.kmeans_fixedpoint(emb, k=4, iters=1).collect()
    # same partition of the points, and sum_own_d2 is exactly the
    # per-cluster inertia of the assignment
    by_cluster = {}
    for r in asg:
        c = by_cluster.setdefault(r["cluster"], [0, 0])
        c[0] += 1
        c[1] += r["d2"]
    got = {r["cluster"]: (r["n_points"], r["sum_own_d2"]) for r in sep}
    assert got == {c: (n, d) for c, (n, d) in by_cluster.items()}
    for r in sep:
        # second-best >= best pointwise, so the sums inherit it
        assert r["sum_next_d2"] >= r["sum_own_d2"]
        if r["sum_own_d2"] > 0:
            assert r["separation"] == r["sum_next_d2"] / r["sum_own_d2"]
