"""Round-9 operator batch: the five round-8 library additions that
shipped without queries (round-8 ADVICE item) — CUPED adjustment,
sketch join-size estimate, deterministic skip-gram negative sampling,
session surprise scoring, clustering-depth layout audit.

Novel-algebra entries carry their INDEPENDENT reference test (the
q244-lesson checklist rule: the oracle replays the same algebra, so a
mirror-symmetric bug would hash green — only a from-scratch
reimplementation catches it):
  * cuped_adjustment       -> pure-Python per-unit sums + textbook
    theta/moment algebra (statistics-module style, no decimal path);
  * join_size_estimate     -> the exact side vs an ACTUAL materialized
    join; the estimate re-derived with hashlib.md5 (independent of
    Spark's conv path);
  * skipgram_negative_draws -> full triple multiset rebuilt in plain
    Python (tokenize, rank table, hashlib draws);
  * session_surprise       -> leave-in Markov model fitted and scored
    with dicts + math.log;
  * clustering_depth       -> brute-force file cutting + probe
    containment scan over sorted rows.
"""

from __future__ import annotations

import hashlib
import math
import random
from datetime import datetime, timedelta

from pyspark.sql import Row

from nyc_taxi_data_prediction_pyspark_spark.operators import (
    evaluation,
    mining,
    text as textops,
)
from nyc_taxi_data_prediction_pyspark_spark.operators import aggregates as agg
from nyc_taxi_data_prediction_pyspark_spark.operators.layout import clustering_depth


# --------------------------------------------------------- CUPED


def test_cuped_matches_python_moment_algebra(spark):
    rng = random.Random(19)
    t0 = datetime(2024, 3, 1)
    rows = []
    # 40 units; a unit's post activity strongly correlates with its
    # pre activity (3 events in each half, values around a unit base)
    for u in range(40):
        base = rng.uniform(1, 9)
        for s in range(6):
            half = 0 if s < 3 else 10000  # minutes: both halves hit
            ts = t0 + timedelta(minutes=half + rng.randrange(0, 9000))
            rows.append(Row(u=u, tr=u % 2 == 0, ts=ts,
                            v=round(base + rng.uniform(-1, 1), 4)))
    # pin the window so the midpoint split is where we think it is
    rows.append(Row(u=0, tr=True, ts=t0, v=0.0))
    rows.append(Row(u=0, tr=True, ts=t0 + timedelta(minutes=20000), v=0.0))
    out = {
        r.treat: r
        for r in evaluation.cuped_adjustment(
            spark.createDataFrame(rows), unit_col="u", treat_col="tr",
            ts_col="ts", value_col="v",
        ).collect()
    }
    # ---- independent replay: textbook population moments ----
    lo = min(r.ts for r in rows)
    hi = max(r.ts for r in rows)
    mid_us = int(lo.timestamp() * 1e6) + (
        int(hi.timestamp() * 1e6) - int(lo.timestamp() * 1e6)
    ) // 2
    per: dict[int, list[float]] = {}
    for r in rows:
        x, y = per.setdefault(r.u, [0.0, 0.0])
        if int(r.ts.timestamp() * 1e6) > mid_us:
            per[r.u][1] = y + r.v
        else:
            per[r.u][0] = x + r.v
    xs = {u: xy[0] for u, xy in per.items()}
    ys = {u: xy[1] for u, xy in per.items()}
    n = len(per)
    mx = sum(xs.values()) / n
    my = sum(ys.values()) / n
    vx = sum(x * x for x in xs.values()) / n - mx * mx
    cxy = sum(xs[u] * ys[u] for u in per) / n - mx * my
    theta = cxy / vx
    for treat in (False, True):
        units = [u for u in per if (u % 2 == 0) == treat]
        na = len(units)
        amx = sum(xs[u] for u in units) / na
        amy = sum(ys[u] for u in units) / na
        avx = sum(xs[u] ** 2 for u in units) / na - amx * amx
        avy = sum(ys[u] ** 2 for u in units) / na - amy * amy
        acxy = sum(xs[u] * ys[u] for u in units) / na - amx * amy
        got = out[treat]
        assert got.n_units == na
        assert abs(got.theta - theta) < 1e-6
        assert abs(got.mean_post - amy) < 1e-6
        assert abs(got.var_post - avy) < 1e-6
        assert abs(got.mean_adj - (amy - theta * (amx - mx))) < 1e-6
        var_adj = avy - 2 * theta * acxy + theta * theta * avx
        assert abs(got.var_adj - var_adj) < 1e-5
        assert abs(got.var_reduction_pct - (1 - var_adj / avy) * 100) < 1e-3
        # correlated covariate => genuine variance reduction
        assert got.var_reduction_pct > 0


def test_cuped_theta_zero_when_pre_is_constant(spark):
    """vx == 0 -> theta NULL-propagates (documented degenerate case):
    adjusted columns are NULL, raw columns still present."""
    t0 = datetime(2024, 3, 1)
    rows = [
        Row(u=u, tr=u % 2 == 0, ts=t0 + timedelta(hours=30 * u + off), v=1.0)
        for u in range(6)
        for off in (0, 300)
    ]
    # every unit's pre-sum identical -> var(pre) == 0
    out = evaluation.cuped_adjustment(
        spark.createDataFrame(rows), unit_col="u", treat_col="tr",
        ts_col="ts", value_col="v",
    ).collect()
    assert all(r.theta is None and r.mean_adj is None for r in out)
    assert all(r.mean_post is not None for r in out)


# ------------------------------------------------ join size estimate


def test_join_size_estimate_exact_vs_real_join_and_hashlib_est(spark):
    rng = random.Random(23)
    left = [Row(k=rng.randrange(0, 400)) for _ in range(3000)]
    right = [Row(k=rng.randrange(0, 400)) for _ in range(1500)]
    out = agg.join_size_estimate(
        spark.createDataFrame(left), spark.createDataFrame(right),
        left_key="k", right_key="k", inv_rate=8,
    ).collect()[0]
    # exact side: the ACTUAL join cardinality
    from collections import Counter

    fl, fr = Counter(r.k for r in left), Counter(r.k for r in right)
    exact = sum(fl[k] * fr[k] for k in fl if k in fr)
    assert out.exact_rows == exact
    # estimate side: hashlib re-derivation of the coordinated sample
    thresh = (1 << 60) // 8

    def h(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)

    sampled = [k for k in fl if k in fr and h(k) < thresh]
    est = 8 * sum(fl[k] * fr[k] for k in sampled)
    assert out.est_rows == est
    assert out.sampled_keys == len(sampled)
    assert abs(out.rel_err - (est - exact) / exact) < 1e-6
    # the sample is non-trivial and the estimate is in the ballpark
    assert 0 < out.sampled_keys < len(sampled) + 1
    assert abs(out.rel_err) < 1.0


# ------------------------------------------------ skipgram negatives


def test_skipgram_draws_match_pure_python_replay(spark):
    texts = {
        1: "the cat sat on the mat",
        2: "a dog  Barked at THE cat",
        3: "one",          # single token -> no pairs
        4: "red fish blue fish red fish",
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    got = sorted(
        (r.center, r.context, r.negative)
        for r in textops.skipgram_negative_draws(
            df, id_col="doc_id", text_col="text", k_neg=2
        ).collect()
    )
    # ---- plain-Python rebuild ----
    toks = {
        i: " ".join(t.lower().split()).split(" ") for i, t in texts.items()
    }
    toks = {i: w for i, w in toks.items() if len(w) >= 2 and w[0] != ""}
    # rank -> token, ordered by (doc_id * 100000 + pos)
    inst = sorted(
        (i * 100000 + p, tok)
        for i, w in toks.items()
        for p, tok in enumerate(w)
    )
    by_rank = [tok for _, tok in inst]
    T = len(by_rank)

    def draw(doc, pos, d, j):
        x = int(
            hashlib.md5(f"{doc}_{pos}_{d}_{j}".encode()).hexdigest()[:15], 16
        ) % T
        return by_rank[x]

    want = []
    for i, w in toks.items():
        for p in range(len(w) - 1):
            for d in ("f", "b"):
                c, ctx = (w[p], w[p + 1]) if d == "f" else (w[p + 1], w[p])
                for j in (1, 2):
                    want.append((c, ctx, draw(i, p, d, j)))
    assert got == sorted(want)
    # sanity: doc 3 contributed nothing, doc 4's repeats all present
    assert len(got) == sum((len(w) - 1) * 4 for w in toks.values())


def test_skipgram_negatives_track_frequency(spark):
    """A token holding half the corpus instances should win about
    half the draws — the frequency-proportional contract."""
    text_a = " ".join(["zz"] * 50 + ["q%d" % i for i in range(50)])
    df = spark.createDataFrame([Row(doc_id=1, text=text_a)])
    draws = textops.skipgram_negative_draws(
        df, id_col="doc_id", text_col="text", k_neg=2
    ).collect()
    share = sum(1 for r in draws if r.negative == "zz") / len(draws)
    assert 0.35 < share < 0.65


# ------------------------------------------------- session surprise


def test_session_surprise_matches_dict_markov_replay(spark):
    rng = random.Random(31)
    t0 = datetime(2024, 5, 1)
    types = ["view", "cart", "buy"]
    rows = []
    eid = 0
    for u in range(12):
        for d in range(2):
            for s in range(rng.randrange(2, 7)):
                rows.append(
                    Row(user_id=u, event_id=eid,
                        ts=t0 + timedelta(days=d, minutes=5 * s),
                        event_type=rng.choice(types))
                )
                eid += 1
    out = mining.session_surprise(
        spark.createDataFrame(rows), user_col="user_id", ts_col="ts",
        type_col="event_type", id_col="event_id", k=100,
    ).collect()
    # ---- dict + math.log replay ----
    by_sess: dict[tuple, list] = {}
    for r in rows:
        by_sess.setdefault((r.user_id, r.ts.date()), []).append(r)
    trans: dict[tuple, int] = {}
    outd: dict[str, int] = {}
    sess_pairs: dict[tuple, list[tuple]] = {}
    for key, evs in by_sess.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        ps = list(zip([e.event_type for e in evs], [e.event_type for e in evs[1:]]))
        sess_pairs[key] = ps
        for p in ps:
            trans[p] = trans.get(p, 0) + 1
            outd[p[0]] = outd.get(p[0], 0) + 1
    want = {}
    for key, ps in sess_pairs.items():
        if not ps:
            continue
        nll = sum(-math.log(trans[p] / outd[p[0]]) for p in ps) / len(ps)
        want[key] = (len(ps), nll)
    assert len(out) == len(want)
    for r in out:
        n, nll = want[(r.user_id, r.day)]
        assert r.n_transitions == n
        assert abs(r.nll - nll) < 1e-6
    # ordering: nll descending
    nlls = [r.nll for r in out]
    assert nlls == sorted(nlls, reverse=True)


def test_session_surprise_deterministic_path_scores_zero(spark):
    """A corpus where every transition is forced (deterministic
    chain) has P = 1 everywhere -> nll exactly 0."""
    t0 = datetime(2024, 5, 1)
    rows = [
        Row(user_id=u, event_id=u * 10 + s, ts=t0 + timedelta(minutes=s),
            event_type="abc"[s % 3])
        for u in range(4)
        for s in range(6)
    ]
    out = mining.session_surprise(
        spark.createDataFrame(rows), user_col="user_id", ts_col="ts",
        type_col="event_type", id_col="event_id", k=10,
    ).collect()
    assert out and all(r.nll == 0.0 for r in out)


# ------------------------------------------------- clustering depth


def _brute_depth(rows, bucket_rows, n_probes):
    """(order_key, zone_us) pairs -> (n_files, avg_depth, max_depth)
    by literally cutting sorted rows into files and scanning."""
    rows = sorted(rows)
    files: dict[int, list[int]] = {}
    for idx, (_, z) in enumerate(rows):
        files.setdefault(idx // bucket_rows, []).append(z)
    zones = [(min(v), max(v)) for v in files.values()]
    lo = min(z for _, z in rows)
    hi = max(z for _, z in rows)
    depths = []
    for i in range(n_probes):
        p = lo + (i * (hi - lo)) // (n_probes - 1)
        depths.append(sum(1 for zmin, zmax in zones if zmin <= p <= zmax))
    return len(zones), sum(depths) / n_probes, max(depths)


def test_clustering_depth_clustered_vs_shuffled(spark):
    rng = random.Random(41)
    t0 = datetime(2024, 1, 1)
    n = 5000
    # clustered: key order == time order
    clustered = [
        Row(k=i, z=t0 + timedelta(seconds=i * 7 + rng.randrange(0, 3)))
        for i in range(n)
    ]
    # shuffled: key order independent of time
    perm = list(range(n))
    rng.shuffle(perm)
    shuffled = [Row(k=perm[i], z=r.z) for i, r in enumerate(clustered)]
    for rows in (clustered, shuffled):
        out = clustering_depth(
            spark.createDataFrame(rows), order_col="k", zone_col="z",
            bucket_rows=500, n_probes=16,
        ).collect()[0]
        nf, avg, mx = _brute_depth(
            [(r.k, int(r.z.timestamp() * 1e6)) for r in rows], 500, 16
        )
        assert out.n_files == nf == 10
        assert out.n_probes == 16
        assert abs(out.avg_depth - avg) < 1e-6
        assert out.max_depth == mx
    # and the metric separates the layouts
    d_clu = clustering_depth(
        spark.createDataFrame(clustered), order_col="k", zone_col="z",
        bucket_rows=500, n_probes=16,
    ).collect()[0]
    d_shf = clustering_depth(
        spark.createDataFrame(shuffled), order_col="k", zone_col="z",
        bucket_rows=500, n_probes=16,
    ).collect()[0]
    assert d_clu.avg_depth < 2.0 < d_shf.avg_depth
    assert d_shf.max_depth == 10  # every file spans the whole domain
