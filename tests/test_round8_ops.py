"""Round-8 operator batch: local clustering coefficient, Zipf fit,
sweep-line max concurrency, decayed heavy hitters, A-ES weighted
reservoir, JS source divergence, minhash calibration, streaming CDC
upsert, Mann-Whitney U.

Novel-algebra entries carry their INDEPENDENT reference test (the
q244-lesson checklist rule: the oracle replays the same algebra, so a
mirror-symmetric bug would hash green — only a from-scratch
reimplementation catches it):
  * local_clustering  -> brute-force per-node triangle count on random
    graphs (plain Python sets);
  * zipf_fit          -> numpy.polyfit on the log-log points;
  * max_concurrency   -> brute-force per-boundary overlap scan;
  * decayed_topk      -> Fraction-exact Python replay of the staircase
    decay;
  * weighted_reservoir_sample -> hashlib/math re-derivation of every
    A-ES key (independent of Spark's md5/conv path);
  * js_source_divergence -> dense dict-based JS over the full grid
    (no sparse closed form);
  * mann_whitney_u    -> textbook midrank computation on the sorted
    pooled sample;
  * cdc_upsert_stream -> final store must equal the batch
    latest-per-key apply (the streaming fixpoint contract).
"""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta
from fractions import Fraction

from pyspark.sql import Row, functions as F

from nyc_taxi_data_prediction_pyspark_spark.operators import (
    dedup,
    evaluation,
    mining,
    text as textops,
    windows,
)
from nyc_taxi_data_prediction_pyspark_spark.operators.graph import local_clustering


# ------------------------------------------------- local clustering


def _brute_lcc(edges):
    """Per-node lcc from plain Python sets."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        nbl = sorted(nb)
        tri = sum(
            1
            for i in range(d)
            for j in range(i + 1, d)
            if nbl[j] in adj.get(nbl[i], ())
        )
        out[v] = (d, tri, 2.0 * tri / (d * (d - 1.0)))
    return out


def test_local_clustering_matches_bruteforce_random_graphs(spark):
    rng = random.Random(8)
    for trial in range(3):
        n = 14
        edges = {
            (min(a, b), max(a, b))
            for _ in range(30)
            for a, b in [(rng.randrange(n), rng.randrange(n))]
            if a != b
        }
        df = spark.createDataFrame(
            [Row(src=a, dst=b) for a, b in edges]
        )
        got = {
            r.node: (r.degree, r.triangles, r.lcc)
            for r in local_clustering(df, k=100).collect()
        }
        want = _brute_lcc(edges)
        assert set(got) == set(want), trial
        for v, (d, t, l) in want.items():
            gd, gt, gl = got[v]
            assert (gd, gt) == (d, t), (trial, v)
            assert abs(gl - l) < 1e-6, (trial, v)


def test_local_clustering_triangle_graph(spark):
    df = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=1, dst=3)]
    )
    rows = local_clustering(df).collect()
    assert len(rows) == 3
    assert all(r.lcc == 1.0 and r.triangles == 1 and r.degree == 2 for r in rows)


# ---------------------------------------------------------- zipf fit


def test_zipf_fit_matches_numpy_polyfit(spark):
    import numpy as np

    rng = random.Random(81)
    words = []
    # Zipf-ish corpus: word i appears ~ 600 // (i + 1) times
    for i in range(40):
        words += [f"w{i:02d}"] * (600 // (i + 1))
    rng.shuffle(words)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(words[i::4])) for i in range(4)]
    )
    out = textops.zipf_fit(docs, top_terms=30).collect()[0]
    # independent: counts via Counter, ranks by (count desc, term),
    # slope/intercept/r2 via numpy least squares
    from collections import Counter

    c = Counter(words)
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    x = np.log(np.arange(1, len(top) + 1, dtype=float))
    y = np.log(np.array([v for _, v in top], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert out.n_terms == 30
    assert abs(out.slope - slope) < 1e-6
    assert abs(out.intercept - intercept) < 1e-6
    assert abs(out.r2 - r * r) < 1e-6


# ------------------------------------------------- max concurrency


def test_max_concurrency_matches_bruteforce(spark):
    rng = random.Random(82)
    t0 = datetime(2024, 1, 1)
    iv = []
    for _ in range(60):
        s = t0 + timedelta(minutes=rng.randrange(0, 600))
        e = s + timedelta(minutes=rng.randrange(0, 120))
        iv.append((s, e))
    df = spark.createDataFrame([Row(start_ts=s, end_ts=e) for s, e in iv])
    got = windows.max_concurrency(df, start_col="start_ts", end_col="end_ts", k=5)
    rows = got.collect()
    # brute force: at every boundary instant, count covering intervals
    # (inclusive [s, e]); also verify against the -1 boundaries
    bounds = sorted(
        {s for s, _ in iv} | {e + timedelta(microseconds=1) for _, e in iv}
    )
    conc = {t: sum(1 for s, e in iv if s <= t <= e) for t in bounds}
    best = sorted(conc.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r.peak_ts, r.concurrent) for r in rows] == best


def test_max_concurrency_nested_intervals(spark):
    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            Row(start_ts=t0, end_ts=t0 + timedelta(hours=10)),
            Row(start_ts=t0 + timedelta(hours=1), end_ts=t0 + timedelta(hours=2)),
            Row(start_ts=t0 + timedelta(hours=1), end_ts=t0 + timedelta(hours=3)),
        ]
    )
    top = windows.max_concurrency(
        df, start_col="start_ts", end_col="end_ts", k=1
    ).collect()[0]
    assert top.concurrent == 3
    assert top.peak_ts == t0 + timedelta(hours=1)


# --------------------------------------------------- decayed top-k


def test_decayed_topk_fraction_exact_replay(spark):
    rng = random.Random(83)
    t_ref = datetime(2024, 3, 1)
    rows = []
    for i in range(200):
        rows.append(
            Row(
                k=rng.randrange(8),
                ts=t_ref - timedelta(days=rng.randrange(0, 120), minutes=i),
            )
        )
    # ensure the reference max is exactly t_ref
    rows.append(Row(k=0, ts=t_ref))
    df = spark.createDataFrame(rows)
    got = {
        r.key: (r.n_events, r.score)
        for r in mining.decayed_topk(
            df, key_col="k", ts_col="ts", halflife_days=7, k=25
        ).collect()
    }
    # Fraction-exact replay of the staircase decay
    ref = max(r.ts for r in rows)
    acc: dict[int, Fraction] = {}
    cnt: dict[int, int] = {}
    for r in rows:
        age_us = int((ref - r.ts).total_seconds() * 1_000_000)
        h = min(age_us // (7 * 86_400_000_000), 40)
        acc[r.k] = acc.get(r.k, Fraction(0)) + Fraction(1, 2**h)
        cnt[r.k] = cnt.get(r.k, 0) + 1
    for k, f in acc.items():
        n, score = got[k]
        assert n == cnt[k]
        assert abs(score - float(f)) < 5e-7, k


# ------------------------------------------- weighted reservoir A-ES


def test_weighted_reservoir_keys_match_hashlib_rederivation(spark):
    """Every returned A-ES key re-derived from scratch via hashlib.md5
    + math.log — independent of Spark's md5/conv/ln path — and the
    per-group selection re-checked against the full key ranking."""
    import hashlib

    rng = random.Random(84)
    rows = [
        Row(g=f"g{i % 3}", i=i, w=float(rng.randrange(1, 500)))
        for i in range(90)
    ]
    df = spark.createDataFrame(rows)
    out = mining.weighted_reservoir_sample(
        df, group_cols=["g"], id_col="i", weight_col="w", k=4, seed=42
    ).collect()

    def aes_key(i: int, w: float) -> float:
        h = int(hashlib.md5(f"{i}|42".encode()).hexdigest()[:15], 16)
        u = (h + 1) / float(1 << 60)
        return -math.log(u) / w

    ranked: dict[str, list] = {}
    for r in rows:
        ranked.setdefault(r.g, []).append((aes_key(r.i, r.w), r.i))
    want = {
        g: [i for _, i in sorted(v)[:4]] for g, v in ranked.items()
    }
    got: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.g, r.draw_rank)):
        got.setdefault(r.g, []).append(r.i)
        assert abs(r.aes_key - round(aes_key(r.i, r.w), 9)) < 1e-9
    assert got == want


def test_weighted_reservoir_is_biased_toward_heavy_weights(spark):
    """Distributional sanity: one item with 1000x the weight of 99
    others is drawn as rank 1 (it wins the exponential race with
    overwhelming probability under ANY seed; here the fixed seed's
    draw is simply asserted deterministic + plausible)."""
    rows = [Row(g="a", i=i, w=1.0) for i in range(99)] + [
        Row(g="a", i=999, w=100000.0)
    ]
    out = mining.weighted_reservoir_sample(
        spark.createDataFrame(rows), group_cols=["g"], id_col="i",
        weight_col="w", k=1, seed=42,
    ).collect()
    assert out[0].i == 999


# ------------------------------------------------- JS divergence


def test_js_divergence_matches_dense_dict_computation(spark):
    rng = random.Random(85)
    vocab = [f"t{i}" for i in range(30)]
    docs = []
    for d in range(40):
        src = f"s{d % 3}"
        # sources draw from shifted vocab slices so the divergence is
        # nonzero and every source misses some terms
        lo = (d % 3) * 8
        words = [vocab[rng.randrange(lo, min(lo + 18, 30))] for _ in range(50)]
        docs.append(Row(doc_id=d, source=src, text=" ".join(words)))
    df = spark.createDataFrame(docs)
    out = {
        r.source: (r.terms_present, r.js)
        for r in textops.js_source_divergence(
            df, source_col="source", text_col="text", min_count=5
        ).collect()
    }
    # dense reference: full vocab grid, no sparse closed form
    from collections import Counter

    per_src: dict[str, Counter] = {}
    for r in docs:
        per_src.setdefault(r.source, Counter()).update(r.text.split())
    glob = Counter()
    for c in per_src.values():
        glob.update(c)
    V = {t for t, c in glob.items() if c >= 5}
    for s, cs in per_src.items():
        ts = sum(cs[t] for t in V)
        tr = sum(glob[t] for t in V) - ts
        js = 0.0
        for t in V:
            p = cs.get(t, 0) / ts
            q = (glob[t] - cs.get(t, 0)) / tr
            m = (p + q) / 2.0
            if p > 0:
                js += 0.5 * p * math.log(p / m)
            if q > 0:
                js += 0.5 * q * math.log(q / m)
        n_present, got_js = out[s]
        assert n_present == sum(1 for t in V if cs.get(t, 0) > 0)
        assert abs(got_js - js) < 1e-6, s


# --------------------------------------------- minhash calibration


def test_minhash_calibration_exact_side_matches_python_sets(spark):
    """The est side is q55's (independently tested); here the EXACT
    side and the rollup: recompute exact Jaccard with Python set ops
    for every candidate pair and rebuild the calibration table."""
    texts = {
        1: "the quick brown fox jumps over the lazy dog today",
        2: "the quick brown fox jumps over the lazy cat today",
        3: "the quick brown fox leaps over the lazy dog today",
        4: "completely different words entirely unrelated content here now",
        5: "the quick brown fox jumps over the lazy dog today",  # dup of 1
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    out = dedup.minhash_calibration(
        df, text_col="text", id_col="doc_id", n=3, k=16, bands=4, seed=42
    ).collect()
    pairs = dedup.minhash_native_pairs(
        df, text_col="text", id_col="doc_id", n=3, k=16, bands=4,
        jaccard_threshold=0.0, seed=42,
    ).collect()

    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    rebuilt: dict[int, list] = {}
    for p in pairs:
        a, b = sh(texts[p.id_a]), sh(texts[p.id_b])
        exact = len(a & b) / len(a | b)
        lvl = round(p.est_jaccard * 16)
        rebuilt.setdefault(lvl, []).append((p.est_jaccard, exact))
    assert len(out) == len(rebuilt)
    for r in out:
        recs = rebuilt[r.eq_components]
        assert r.n_pairs == len(recs)
        mean_exact = sum(e for _, e in recs) / len(recs)
        mae = sum(abs(est - e) for est, e in recs) / len(recs)
        assert abs(r.mean_exact - mean_exact) < 1e-6
        assert abs(r.mean_abs_err - mae) < 1e-6
    # the duplicate pair (1,5) must sit at full agreement, exact 1.0
    full = [r for r in out if r.eq_components == 16]
    assert full and full[0].mean_exact == 1.0


# ----------------------------------------------------- Mann-Whitney


def _mw_reference(xs, ys):
    """Textbook midranks on the sorted pooled sample."""
    pooled = sorted([(v, 0) for v in xs] + [(v, 1) for v in ys])
    ranks = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0  # average of ranks i+1..j
        ranks[pooled[i][0]] = mid
        i = j
    r1 = sum(ranks[v] for v in xs)
    n1, n2 = len(xs), len(ys)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    from collections import Counter

    tie = sum(t**3 - t for t in Counter(v for v, _ in pooled).values())
    var = (n1 * n2 / 12.0) * ((n + 1) - tie / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var) if var > 0 else None
    return u1, z


def test_mann_whitney_matches_textbook_midranks(spark):
    rng = random.Random(86)
    for trial in range(3):
        xs = [float(rng.randrange(1, 12)) for _ in range(40)]
        ys = [float(rng.randrange(3, 15)) for _ in range(55)]
        rows = [Row(v=v, a=True) for v in xs] + [Row(v=v, a=False) for v in ys]
        out = evaluation.mann_whitney_u(
            spark.createDataFrame(rows), value_col="v", sample_col="a"
        ).collect()[0]
        u1, z = _mw_reference(xs, ys)
        assert (out.n_a, out.n_b) == (40, 55)
        assert abs(out.u_a - u1) < 1e-6, trial
        assert abs(out.z - z) < 1e-6, trial


def test_mann_whitney_degenerate_all_equal_is_null_z(spark):
    rows = [Row(v=5.0, a=True)] * 4 + [Row(v=5.0, a=False)] * 6
    out = evaluation.mann_whitney_u(
        spark.createDataFrame(rows), value_col="v", sample_col="a"
    ).collect()[0]
    assert out.z is None
    assert out.u_a == 12.0  # all midranks tied: U = n1*n2/2


# ----------------------------------------------- streaming CDC upsert


def test_cdc_upsert_stream_equals_batch_apply(spark, sf_dir, tmp_path):
    from nyc_taxi_data_prediction_pyspark_spark.streaming.pipeline import (
        cdc_upsert_stream,
    )

    applied = cdc_upsert_stream(
        spark, sf_dir, str(tmp_path / "cdc"), n_arrival_files=3
    )
    got = {r.key: (r.version, r.op, r.totalprice) for r in applied.collect()}
    # batch reference: derive the same change set and fold in Python
    from nyc_taxi_data_prediction_pyspark_spark.catalog import load

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).collect()
    want = {}
    for o in orders:
        want[o.o_orderkey] = (1, "I", o.o_totalprice)
    for o in orders:
        if o.o_orderkey % 3 == 0:
            want[o.o_orderkey] = (2, "U", o.o_totalprice + 1.0)
    for o in orders:
        if o.o_orderkey % 7 == 0:
            del want[o.o_orderkey]  # tombstone drops at readout
    assert got == want
    # tombstones retained in the store itself (late low versions can
    # never resurrect): store row count = live + deleted
    import os

    store = os.path.join(str(tmp_path / "cdc"), "store")
    all_rows = spark.read.parquet(store).count()
    n_deleted = sum(1 for o in orders if o.o_orderkey % 7 == 0)
    assert all_rows == len(want) + n_deleted


# ------------------------------------------------ grouped KS + BH


def test_grouped_ks_bh_matches_scipy_free_reference(spark):
    """Independent reference: per-group KS D computed by brute-force
    ECDF comparison at every pooled value; BH step-up replayed on
    exact p-values computed with math.exp (the operator never calls
    exp — this proves the log-space rewrite is the same decision)."""
    rng = random.Random(87)
    rows = []
    for g, shift in (("a", 0), ("b", 4), ("c", 0)):
        for i in range(80):
            rows.append(
                Row(g=g, v=float(rng.randrange(0, 10) + (shift if i % 2 else 0)),
                    flag=i % 2 == 0)
            )
    out = {
        r[0]: r
        for r in evaluation.grouped_ks_bh(
            spark.createDataFrame(rows), group_col="g", value_col="v",
            sample_col="flag", q=0.05,
        ).collect()
    }
    # brute force per group
    stats = {}
    for g in ("a", "b", "c"):
        xs = sorted(r.v for r in rows if r.g == g and r.flag)
        ys = sorted(r.v for r in rows if r.g == g and not r.flag)
        na, nb = len(xs), len(ys)
        vals = sorted(set(xs) | set(ys))
        d = max(
            abs(
                sum(1 for x in xs if x <= v) * nb
                - sum(1 for y in ys if y <= v) * na
            )
            for v in vals
        )
        dd = d / (na * nb)
        lam = na * nb / (na + nb)
        score = 2.0 * lam * dd * dd
        stats[g] = (na, nb, dd, score, 2.0 * math.exp(-score))
    # ranks: p ascending == score descending
    order = sorted(stats, key=lambda g: (-stats[g][3], g))
    m = len(order)
    kstar = 0
    for i, g in enumerate(order, 1):
        if stats[g][4] <= i * 0.05 / m:
            kstar = i
    for i, g in enumerate(order, 1):
        r = out[g]
        na, nb, dd, score, _p = stats[g]
        assert (r.n_a, r.n_b, r.bh_rank) == (na, nb, i)
        assert abs(r.ks_d - dd) < 1e-6
        assert abs(r.score - score) < 1e-5
        assert r.reject == (i <= kstar), g


# ------------------------------------------------- bootstrap CI


def test_bootstrap_ci_matches_hashlib_replay(spark):
    """Weights re-derived from scratch (hashlib.md5 + the LCG param
    expansion) and the whole CI rebuilt in pure Python."""
    import hashlib

    from nyc_taxi_data_prediction_pyspark_spark.functions.hashing import (
        MERSENNE_P,
        minhash_params,
    )
    from nyc_taxi_data_prediction_pyspark_spark.operators.aggregates import (
        POISSON1_CDF,
        grouped_bootstrap_ci,
    )

    rng = random.Random(88)
    rows = [
        Row(g=f"g{i % 2}", i=1000 + i, v=float(rng.randrange(0, 100)))
        for i in range(300)
    ]
    out = {
        r.g: r
        for r in grouped_bootstrap_ci(
            spark.createDataFrame(rows), group_cols=["g"], id_col="i",
            value_col="v", n_resamples=32, seed=42,
        ).collect()
    }
    params = minhash_params(32, 42)

    def weight(i, a, b):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % MERSENNE_P
        u = ((h * a + b) % MERSENNE_P) / float(MERSENNE_P)
        for w, t in enumerate(POISSON1_CDF):
            if u < t:
                return w
        return 5

    for g in ("g0", "g1"):
        grp = [r for r in rows if r.g == g]
        means = sorted(
            sum(weight(r.i, a, b) * r.v for r in grp)
            / sum(weight(r.i, a, b) for r in grp)
            for a, b in params
        )
        got = out[g]
        assert got.n == len(grp)
        assert abs(got.mean - sum(r.v for r in grp) / len(grp)) < 1e-6
        assert abs(got.ci_lo - means[1]) < 1e-6
        assert abs(got.ci_hi - means[30]) < 1e-6
        assert got.ci_lo <= got.mean <= got.ci_hi


def test_bootstrap_ci_degenerate_resample_folds_to_overall_mean(spark):
    """Round-8 ADVICE: a resample with total weight 0 (near-certain
    for a 1-row group across 32 resamples) must fold to the group's
    overall mean in the engine — not NULL/NaN — mirroring the oracle's
    CASE.  Replayed in pure Python with the same substitution rule."""
    import hashlib

    from nyc_taxi_data_prediction_pyspark_spark.functions.hashing import (
        MERSENNE_P,
        minhash_params,
    )
    from nyc_taxi_data_prediction_pyspark_spark.operators.aggregates import (
        POISSON1_CDF,
        grouped_bootstrap_ci,
    )

    params = minhash_params(32, 42)

    def weight(i, a, b):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % MERSENNE_P
        u = ((h * a + b) % MERSENNE_P) / float(MERSENNE_P)
        for w, t in enumerate(POISSON1_CDF):
            if u < t:
                return w
        return 5

    # a 1-row group: P(all 32 resample weights > 0) = (1-e^-1)^32 ~ 4e-7
    the_id, the_val = 7, 13.5
    ws = [weight(the_id, a, b) for a, b in params]
    assert 0 in ws, "fixture must exercise the degenerate path"
    means = sorted((w * the_val / w) if w > 0 else the_val for w in ws)
    row = grouped_bootstrap_ci(
        spark.createDataFrame([Row(g="solo", i=the_id, v=the_val)]),
        group_cols=["g"], id_col="i", value_col="v",
        n_resamples=32, seed=42,
    ).collect()[0]
    assert row.n == 1 and abs(row.mean - the_val) < 1e-9
    assert row.ci_lo is not None and row.ci_hi is not None
    assert abs(row.ci_lo - means[1]) < 1e-6
    assert abs(row.ci_hi - means[30]) < 1e-6


# -------------------------------------------------- yield curve


def test_dedup_yield_curve_monotone_and_consistent(spark):
    """Curve invariants + consistency with the (independently tested)
    candidate pair frame: suffix sums rebuilt in Python."""
    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        2: "alpha beta gamma delta epsilon zeta eta theta iota lambda",
        3: "alpha beta gamma delta epsilon zeta eta theta mu nu",
        4: "one two three four five six seven eight nine ten",
        5: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    }
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in texts.items()])
    curve = dedup.dedup_yield_curve(
        df, text_col="text", id_col="doc_id", n=3, k=16, bands=4, seed=42
    ).collect()
    pairs = dedup.minhash_native_pairs(
        df, text_col="text", id_col="doc_id", n=3, k=16, bands=4,
        jaccard_threshold=0.0, seed=42,
    ).collect()
    lv = [round(p.est_jaccard * 16) for p in pairs]
    best: dict[int, int] = {}
    for p, l in zip(pairs, lv):
        best[p.id_a] = max(best.get(p.id_a, 0), l)
        best[p.id_b] = max(best.get(p.id_b, 0), l)
    assert len(curve) == 16
    for r in curve:
        assert r.pairs_ge == sum(1 for l in lv if l >= r.eq_components)
        assert r.docs_ge == sum(1 for l in best.values() if l >= r.eq_components)
    # monotone non-increasing in the threshold
    seq = sorted(curve, key=lambda r: -r.eq_components)
    for a, b in zip(seq, seq[1:]):
        assert a.pairs_ge <= b.pairs_ge and a.docs_ge <= b.docs_ge


# ---------------------------------------------- fightin' words


def test_fightin_words_matches_dense_python(spark):
    from collections import Counter

    rng = random.Random(89)
    docs = []
    for d in range(30):
        src = f"s{d % 2}"
        base = ["common"] * 6
        marked = ["leftish"] * 4 if src == "s0" else ["rightish"] * 4
        words = base + marked + [f"w{rng.randrange(6)}" for _ in range(8)]
        rng.shuffle(words)
        docs.append(Row(doc_id=d, source=src, text=" ".join(words)))
    out = textops.fightin_words(
        spark.createDataFrame(docs), source_col="source", text_col="text",
        min_count=5, alpha_frac=0.01, k=3,
    ).collect()
    per: dict[str, Counter] = {}
    for r in docs:
        per.setdefault(r.source, Counter()).update(r.text.split())
    glob = Counter()
    for c in per.values():
        glob.update(c)
    V = {t for t, c in glob.items() if c >= 5}
    tv = sum(glob[t] for t in V)
    want: dict[str, list] = {}
    for s, cs in per.items():
        ts = sum(cs[t] for t in V)
        tr = tv - ts
        zs = []
        for t in V:
            c = cs.get(t, 0)
            if c == 0:
                continue
            r_ = glob[t] - c
            at = 0.01 * glob[t]
            A = 0.01 * tv
            delta = math.log((c + at) / (ts + A - c - at)) - math.log(
                (r_ + at) / (tr + A - r_ - at)
            )
            var = 1.0 / (c + at) + 1.0 / (r_ + at)
            zs.append((-delta / math.sqrt(var), t))
        want[s] = [t for _, t in sorted(zs)[:3]]
    got: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.source, r.rank)):
        got.setdefault(r.source, []).append(r.term)
    assert got == want
    # the planted markers dominate their sides
    assert got["s0"][0] == "leftish" and got["s1"][0] == "rightish"


# ------------------------------------------------ isotropy


def test_embedding_isotropy_matches_numpy_pairwise(spark):
    import numpy as np

    rng = np.random.default_rng(90)
    vecs = rng.normal(size=(40, 8)).astype(float) + 0.5  # anisotropic
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )
    from nyc_taxi_data_prediction_pyspark_spark.operators.similarity import (
        embedding_isotropy,
    )

    out = embedding_isotropy(df, vec_col="embedding", dim=8).collect()[0]
    n = len(vecs)
    dots = vecs @ vecs.T
    mean_pair = (dots.sum() - np.trace(dots)) / (n * (n - 1))
    assert out.n == n
    assert abs(out.mean_norm - np.linalg.norm(vecs, axis=1).mean()) < 1e-6
    assert abs(out.mean_sq_norm - (vecs**2).sum(axis=1).mean()) < 1e-6
    assert abs(out.mean_pairwise_dot - mean_pair) < 1e-6


def test_embedding_isotropy_validates_dim(spark):
    """Round-8 ADVICE: dim is enforced per row, so a mismatched
    column fails loudly instead of silently breaking oracle parity."""
    import pytest

    from nyc_taxi_data_prediction_pyspark_spark.operators.similarity import (
        embedding_isotropy,
    )

    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 2.0, 3.0]),
         Row(vec_id=1, embedding=[4.0, 5.0, 6.0]),
         Row(vec_id=2, embedding=[1.0, 2.0])]
    )
    with pytest.raises(Exception, match="expected 3-d vectors"):
        embedding_isotropy(df, vec_col="embedding", dim=3).collect()
    # a consistent column at the declared dim still works
    ok = embedding_isotropy(
        df.where(F.size("embedding") == 3), vec_col="embedding", dim=3
    ).collect()[0]
    assert ok.n == 2


# ------------------------------------------------------ modularity


def test_modularity_matches_handbuilt_partition(spark):
    """Two 4-cliques joined by one bridge edge: Q known in closed
    form, recomputed by a from-scratch Python pass."""
    from nyc_taxi_data_prediction_pyspark_spark.operators.graph import modularity

    cliques = [(a, b) for grp in ([1, 2, 3, 4], [5, 6, 7, 8])
               for i, a in enumerate(grp) for b in grp[i + 1:]]
    edges = cliques + [(4, 5)]
    labels = [(v, 0 if v <= 4 else 1) for v in range(1, 9)]
    out = modularity(
        spark.createDataFrame([Row(src=a, dst=b) for a, b in edges]),
        spark.createDataFrame([Row(node=v, label=l) for v, l in labels]),
    ).collect()[0]
    # independent computation
    m = len(edges)
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    lab = dict(labels)
    q = 0.0
    for c in (0, 1):
        mc = sum(1 for a, b in edges if lab[a] == c and lab[b] == c)
        dc = sum(d for v, d in deg.items() if lab[v] == c)
        q += mc / m - (dc / (2 * m)) ** 2
    assert out.n_edges == m and out.n_communities == 2
    assert abs(out.modularity - q) < 1e-6


def test_modularity_random_partition_is_near_zero(spark):
    """A random-ish balanced partition of a complete graph has Q ~ 0
    (exactly -1/(2(n-1))-ish for even splits of K_n); just assert the
    sign-magnitude sanity and the internal consistency vs Python."""
    from nyc_taxi_data_prediction_pyspark_spark.operators.graph import modularity

    n = 10
    edges = [(a, b) for a in range(n) for b in range(a + 1, n)]
    labels = [(v, v % 2) for v in range(n)]
    out = modularity(
        spark.createDataFrame([Row(src=a, dst=b) for a, b in edges]),
        spark.createDataFrame([Row(node=v, label=l) for v, l in labels]),
    ).collect()[0]
    # closed form for an even split of K_n: each side has C(n/2,2)
    # intra edges and half the degree mass -> Q = 2*(C(5,2)/45 - 1/4)
    m = len(edges)
    want = 2 * (10 / m - 0.25)
    assert abs(out.modularity - want) < 1e-6  # output rounds to 6
    assert out.modularity < 0  # worse than chance, as it must be


# ------------------------------------------------- JM surprise


def test_jm_surprise_matches_dict_lm(spark):
    docs = {
        1: "a b a b a b c",
        2: "a b a b a b a b",
        3: "x y z q r s",  # rare bigrams -> most surprising
    }
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs.items()])
    out = {
        r.doc_id: (r.n_bigrams, r.nll)
        for r in textops.jm_bigram_surprise(
            df, id_col="doc_id", text_col="text", lam=0.7, k=10
        ).collect()
    }
    from collections import Counter

    big: Counter = Counter()
    uni: Counter = Counter()
    for t in docs.values():
        w = t.split()
        uni.update(w)
        big.update(zip(w, w[1:]))
    T = sum(uni.values())
    for i, t in docs.items():
        w = t.split()
        insts = list(zip(w, w[1:]))
        nll = sum(
            -math.log(
                0.7 * (big[p] / uni[p[0]]) + (1.0 - 0.7) * (uni[p[1]] / T)
            )
            for p in insts
        ) / len(insts)
        n, got = out[i]
        assert n == len(insts)
        assert abs(got - nll) < 1e-6, i
    # note: doc 3's bigrams are unique WITH unique contexts, so
    # c12/c1 = 1 and JM scores them PREDICTABLE — the surprising doc
    # is the one whose contexts are shared but continuations vary
    # (doc 1's "a b ... b c"); the reference values above already
    # pin the exact ordering


# ------------------------------------------------ EB shrinkage


def test_eb_shrinkage_matches_python_mom(spark):
    rng = random.Random(91)
    rows = []
    for k in range(12):
        p = 0.1 + 0.05 * (k % 5)
        for _ in range(20 + k):
            rows.append(Row(k=k, s=rng.random() < p))
    # the motivating "3-for-3" entity: below min_trials, so it must
    # NOT enter the prior fit but MUST appear in the output, shrunk
    # (round-8 ADVICE semantics fix)
    rows += [Row(k=99, s=True)] * 3
    out = {
        r.key: r
        for r in evaluation.eb_shrunk_rates(
            spark.createDataFrame(rows), key_col="k", success_col="s",
            min_trials=5, k=20,
        ).collect()
    }
    per: dict[int, list] = {}
    for r in rows:
        per.setdefault(r.k, []).append(bool(r.s))
    rates = {k: sum(v) / len(v) for k, v in per.items() if len(v) >= 5}
    m = sum(rates.values()) / len(rates)
    v = sum(r * r for r in rates.values()) / len(rates) - m * m
    common = m * (1 - m) / v - 1
    alpha, beta = m * common, (1 - m) * common
    for k, obs in per.items():
        got = out[k]
        s, n = sum(obs), len(obs)
        assert (got.trials, got.successes) == (n, s)
        assert abs(got.shrunk_rate - (s + alpha) / (n + alpha + beta)) < 1e-6
        assert abs(got.alpha - alpha) < 1e-5 and abs(got.beta - beta) < 1e-5
    # shrinkage is strictly toward the prior mean
    for k, obs in per.items():
        raw = sum(obs) / len(obs)
        sh = out[k].shrunk_rate
        assert (raw - m) * (raw - sh) >= -1e-12  # moved toward m
    # the 3-for-3 entity is present, heavily shrunk away from 1.0
    got99 = out[99]
    assert got99.raw_rate == 1.0
    assert got99.shrunk_rate < 1.0 - 1e-6
    assert abs(got99.shrunk_rate - (3 + alpha) / (3 + alpha + beta)) < 1e-6


# ------------------------------------------------ entropy rate


def test_markov_entropy_rate_two_state_closed_form(spark):
    """Deterministic cycle a->b->a has H = 0; a uniform 2-state chain
    has H = ln 2; check both against the closed forms."""
    cyc = spark.createDataFrame(
        [Row(i="a", j="b", n=10), Row(i="b", j="a", n=10)]
    )
    out = mining.markov_entropy_rate(
        cyc, from_col="i", to_col="j", count_col="n"
    ).collect()[0]
    assert out.entropy_rate == 0.0
    assert abs(out.sum_pi - 1.0) < 1e-6
    uni = spark.createDataFrame(
        [Row(i=a, j=b, n=5) for a in ("a", "b") for b in ("a", "b")]
    )
    out2 = mining.markov_entropy_rate(
        uni, from_col="i", to_col="j", count_col="n"
    ).collect()[0]
    assert abs(out2.entropy_rate - math.log(2)) < 1e-6


def test_markov_entropy_rate_dangling_state_leaks_mass(spark):
    """a->b only (b dangling): mass drains to b then vanishes —
    sum_pi << 1 is the documented self-check signal."""
    d = spark.createDataFrame([Row(i="a", j="b", n=3)])
    out = mining.markov_entropy_rate(
        d, from_col="i", to_col="j", count_col="n"
    ).collect()[0]
    assert out.sum_pi < 0.01


# ---------------------------------------------------------- DiD


def test_diff_in_diff_matches_statsmodels_free_reference(spark):
    """Planted effect: treated units gain +10 post-split; the DiD
    point estimate recovers it exactly against a from-scratch Python
    computation (means, Welch-style SE)."""
    rng = random.Random(92)
    t0 = datetime(2024, 1, 1)
    rows = []
    for u in range(40):
        treat = u % 2 == 0
        for d in range(20):
            post = d >= 10
            base = 50.0 + (u % 7) + rng.randrange(0, 5)
            val = base + (10.0 if treat and post else 0.0)
            rows.append(
                Row(tr=treat, ts=t0 + timedelta(days=d), v=float(val))
            )
    out = evaluation.diff_in_diff(
        spark.createDataFrame(rows), treat_col="tr", ts_col="ts", value_col="v"
    ).collect()[0]
    lo = min(r.ts for r in rows)
    hi = max(r.ts for r in rows)
    mid_us = int(lo.timestamp() * 1e6) + (
        int(hi.timestamp() * 1e6) - int(lo.timestamp() * 1e6)
    ) // 2
    cells: dict[tuple, list] = {}
    for r in rows:
        cells.setdefault(
            (r.tr, int(r.ts.timestamp() * 1e6) > mid_us), []
        ).append(r.v)

    def mv(c):
        xs = cells[c]
        m = sum(xs) / len(xs)
        var = sum((x - m) ** 2 for x in xs) / (len(xs) - 1)
        return m, var, len(xs)

    mtp, vtp, ntp = mv((True, True))
    mta, vta, nta = mv((True, False))
    mcp, vcp, ncp = mv((False, True))
    mca, vca, nca = mv((False, False))
    did = (mtp - mta) - (mcp - mca)
    se = math.sqrt(vtp / ntp + vta / nta + vcp / ncp + vca / nca)
    assert abs(out.did - did) < 1e-6
    assert abs(out.se - se) < 1e-6
    assert abs(out.t_stat - did / se) < 1e-4
    assert 8.0 < out.did < 12.0  # recovers the planted +10
