"""Round-9 second operator batch: mutual information / Theil's U,
Good–Turing re-estimation, Heaps'-law growth fit, out-of-fold target
encoding, quantile normalization, tail dependence, Wald SPRT.

Novel-algebra entries carry their INDEPENDENT reference test (the
q244-lesson checklist rule: the oracle replays the same algebra, so a
mirror-symmetric bug would hash green — only a from-scratch
reimplementation catches it):
  * mutual_information   -> dict-based joint/marginal entropies with
    plain math.log (no decimal quantization, no entropy identity —
    MI summed directly over cells);
  * good_turing          -> collections.Counter count-of-counts;
  * heaps_law            -> set-based cumulative vocabulary walk +
    float OLS on the log-log points;
  * oof_target_encoding  -> hashlib.md5 fold replay + dict sums;
  * quantile_normalization -> python sorted() ranks and bin means;
  * tail_dependence      -> sorted-index ranks, brute-force joint
    tail counts (exact integer comparison);
  * sprt_ab              -> decimal.Decimal LLR walk with the same
    rounded log constants, crossing scan in plain Python.
"""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter
from datetime import datetime, timedelta
from decimal import Decimal

import pytest
from pyspark.sql import Row

from nyc_taxi_data_prediction_pyspark_spark.operators import (
    aggregates as agg,
    evaluation,
    text as textops,
)


# ------------------------------------------------ mutual information


def test_mutual_information_matches_dict_replay(spark):
    rng = random.Random(7)
    rows = []
    for _ in range(400):
        x = rng.choice(["a", "b", "c", "d"])
        # y depends on x for some mass -> MI strictly positive
        y = x[0] if rng.random() < 0.3 else rng.choice(["p", "q", "r"])
        rows.append(Row(x=x, y=y))
    out = agg.mutual_information(
        spark.createDataFrame(rows), x_col="x", y_col="y"
    ).collect()[0]
    # ---- independent replay: direct cell-sum MI, no identity ----
    joint = Counter((r.x, r.y) for r in rows)
    mx = Counter(r.x for r in rows)
    my = Counter(r.y for r in rows)
    n = len(rows)
    mi = sum(
        (c / n) * math.log(n * c / (mx[x] * my[y]))
        for (x, y), c in joint.items()
    )
    hx = -sum((c / n) * math.log(c / n) for c in mx.values())
    hy = -sum((c / n) * math.log(c / n) for c in my.values())
    hxy = -sum((c / n) * math.log(c / n) for c in joint.values())
    assert out.n == n
    assert out.h_x == pytest.approx(hx, abs=2e-6)
    assert out.h_y == pytest.approx(hy, abs=2e-6)
    assert out.h_xy == pytest.approx(hxy, abs=2e-6)
    assert out.mi == pytest.approx(mi, abs=2e-6)
    assert out.nmi == pytest.approx(mi / math.sqrt(hx * hy), abs=2e-6)
    assert out.u_x_given_y == pytest.approx(mi / hx, abs=2e-6)
    assert out.u_y_given_x == pytest.approx(mi / hy, abs=2e-6)
    assert out.mi > 0.01  # the planted dependence is visible


def test_mutual_information_independent_columns_near_zero(spark):
    # a deterministic product grid is EXACTLY independent -> MI = 0
    rows = [Row(x=f"x{i}", y=f"y{j}") for i in range(4) for j in range(5)]
    out = agg.mutual_information(
        spark.createDataFrame(rows * 3), x_col="x", y_col="y"
    ).collect()[0]
    assert out.mi == pytest.approx(0.0, abs=1e-9)
    assert out.h_xy == pytest.approx(out.h_x + out.h_y, abs=1e-9)


# ---------------------------------------------------- Good–Turing


def test_good_turing_matches_counter_replay(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for d in range(30):
        # Zipf-ish draws so small r values are populated
        words = [
            vocab[min(int(rng.paretovariate(1.1)), 59)] for _ in range(40)
        ]
        docs.append(Row(doc_id=d, text=" ".join(words)))
    out = {
        r.r: r
        for r in textops.good_turing(
            spark.createDataFrame(docs), max_r=8, ngram_n=1
        ).collect()
    }
    # ---- independent replay ----
    counts = Counter(w for d in docs for w in d.text.split())
    cofc = Counter(counts.values())
    total = sum(counts.values())
    assert set(out) == {r for r in cofc if r <= 8}
    for r, row in out.items():
        assert row.n_r == cofc[r]
        nxt = cofc.get(r + 1)
        if nxt is None:
            assert row.r_star is None and row.p_r_gt is None
        else:
            r_star = (r + 1) * nxt / cofc[r]
            assert row.r_star == pytest.approx(r_star, abs=2e-6)
            assert row.p_r_gt == pytest.approx(
                r_star * cofc[r] / total, abs=2e-6
            )
        assert row.p_r_obs == pytest.approx(r * cofc[r] / total, abs=2e-6)


def test_good_turing_ngrams_count_ngram_vocabulary(spark):
    docs = [
        Row(doc_id=0, text="a b c a b"),
        Row(doc_id=1, text="a b x"),
        Row(doc_id=2, text="z"),  # shorter than the gram -> no grams
    ]
    out = {
        r.r: r.n_r
        for r in textops.good_turing(
            spark.createDataFrame(docs), max_r=10, ngram_n=2
        ).collect()
    }
    # bigrams: doc0 {ab, bc, ca, ab}, doc1 {ab, bx} -> ab:3, bc/ca/bx:1
    assert out == {1: 3, 3: 1}


# ------------------------------------------------------- Heaps' law


def test_heaps_law_matches_python_ols(spark):
    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(500)]
    docs = []
    for d in range(40):
        words = [vocab[rng.randrange(0, 1 + 12 * (d + 1))] for _ in range(30)]
        docs.append(Row(doc_id=d, text=" ".join(words)))
    out = textops.heaps_law(
        spark.createDataFrame(docs), ngram_n=1
    ).collect()[0]
    # ---- independent replay: set-based vocabulary walk ----
    seen: set[str] = set()
    pts = []
    n_cum = 0
    for d in sorted(docs, key=lambda r: r.doc_id):
        ws = d.text.split()
        n_cum += len(ws)
        seen |= set(ws)
        pts.append((math.log(n_cum), math.log(len(seen))))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    cxy = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    beta = cxy / vx
    assert out.n_docs == n
    assert out.total_tokens == n_cum
    assert out.vocab_size == len(seen)
    assert out.beta == pytest.approx(beta, abs=2e-6)
    assert out.k == pytest.approx(math.exp((sy - beta * sx) / n), abs=2e-5)
    assert out.r2 == pytest.approx(cxy * cxy / (vx * vy), abs=2e-6)
    assert 0.0 < out.beta < 1.0  # a growing corpus sits inside (0, 1)


# --------------------------------------------- OOF target encoding


def _md5_fold(ident: int, k: int) -> int:
    return int(hashlib.md5(str(ident).encode()).hexdigest()[:15], 16) % k


def test_oof_target_encoding_matches_hashlib_replay(spark):
    rng = random.Random(17)
    rows = [
        Row(
            id=i,
            key=rng.choice(["u", "v", "w"]),
            target=round(rng.uniform(0, 10), 3),
        )
        for i in range(300)
    ]
    k, w = 4, 10.0
    out = {
        (r.key, r.fold): r
        for r in evaluation.oof_target_encoding(
            spark.createDataFrame(rows),
            key_col="key",
            target_col="target",
            id_col="id",
            k_folds=k,
            prior_weight=w,
        ).collect()
    }
    # ---- independent replay ----
    cells: dict[tuple[str, int], list[float]] = {}
    for r in rows:
        cells.setdefault((r.key, _md5_fold(r.id, k)), []).append(r.target)
    gmean = sum(r.target for r in rows) / len(rows)
    assert set(out) == set(cells)
    assert len({r.key for r in rows}) == 3  # all three keys materialized
    for (key, fold), vals in cells.items():
        oof = [v for (kk, ff), vv in cells.items() if kk == key and ff != fold for v in vv]
        row = out[(key, fold)]
        assert row.n_in_fold == len(vals)
        assert row.n_oof == len(oof)
        enc = (sum(oof) + w * gmean) / (len(oof) + w)
        assert row.enc == pytest.approx(enc, abs=1e-4)


def test_oof_target_encoding_prior_dominates_empty_oof(spark):
    # one key seen in ONE fold only -> its OOF stats are empty and the
    # encoding collapses to the global mean (pure prior)
    rows = [Row(id=1, key="solo", target=100.0)] + [
        Row(id=i, key="bulk", target=1.0) for i in range(2, 42)
    ]
    out = evaluation.oof_target_encoding(
        spark.createDataFrame(rows),
        key_col="key",
        target_col="target",
        id_col="id",
        k_folds=3,
        prior_weight=5.0,
    )
    solo = [r for r in out.collect() if r.key == "solo"][0]
    gmean = (100.0 + 40 * 1.0) / 41
    assert solo.n_oof == 0
    assert solo.enc == pytest.approx(gmean, abs=1e-6)


# ------------------------------------------ quantile normalization


def test_quantile_normalization_matches_sorted_replay(spark):
    rng = random.Random(23)
    rows = []
    i = 0
    for g, (mu, n) in {"g1": (10, 57), "g2": (20, 40), "g3": (15, 83)}.items():
        for _ in range(n):
            i += 1
            rows.append(Row(id=i, g=g, v=round(rng.gauss(mu, 3), 2)))
    bins = 8
    out = {
        (r.grp, r.bin): r
        for r in agg.quantile_normalization(
            spark.createDataFrame(rows),
            group_col="g",
            value_col="v",
            id_col="id",
            n_bins=bins,
        ).collect()
    }
    # ---- independent replay ----
    per: dict[tuple[str, int], list[float]] = {}
    groups: dict[str, list[Row]] = {}
    for r in rows:
        groups.setdefault(r.g, []).append(r)
    for g, rs in groups.items():
        rs = sorted(rs, key=lambda r: (r.v, r.id))
        n = len(rs)
        for rank0, r in enumerate(rs):
            per.setdefault((g, rank0 * bins // n), []).append(r.v)
    gm = {gb: sum(vs) / len(vs) for gb, vs in per.items()}
    ref: dict[int, list[float]] = {}
    for (g, b), m in gm.items():
        ref.setdefault(b, []).append(m)
    assert set(out) == set(per)
    for (g, b), row in out.items():
        assert row.n_rows == len(per[(g, b)])
        assert row.group_mean == pytest.approx(gm[(g, b)], abs=1e-5)
        rv = sum(ref[b]) / len(ref[b])
        assert row.ref_value == pytest.approx(rv, abs=1e-5)
        assert row.delta == pytest.approx(rv - gm[(g, b)], abs=1e-5)
    # equal-count binning: bin sizes within a group differ by <= 1
    for g, rs in groups.items():
        sizes = [len(per[(g, b)]) for b in range(bins)]
        assert max(sizes) - min(sizes) <= 1


# ------------------------------------------------- tail dependence


def test_tail_dependence_matches_bruteforce_ranks(spark):
    rng = random.Random(29)
    rows = []
    for i in range(200):
        base = rng.uniform(0, 100)
        # strong comonotone component -> visible upper-tail dependence
        rows.append(
            Row(id=i, x=base + rng.uniform(0, 20), y=base + rng.uniform(0, 20))
        )
    qs = (0.8, 0.95)
    out = {
        r.q: r
        for r in agg.tail_dependence(
            spark.createDataFrame(rows),
            x_col="x",
            y_col="y",
            id_col="id",
            quantiles=qs,
        ).collect()
    }
    # ---- independent replay: sorted-index ranks ----
    n = len(rows)
    rx = {
        r.id: i + 1
        for i, r in enumerate(sorted(rows, key=lambda r: (r.x, r.id)))
    }
    ry = {
        r.id: i + 1
        for i, r in enumerate(sorted(rows, key=lambda r: (r.y, r.id)))
    }
    for q in qs:
        k = math.floor(q * n)
        upper = sum(1 for r in rows if rx[r.id] > k and ry[r.id] > k)
        lower = sum(
            1 for r in rows if rx[r.id] <= n - k and ry[r.id] <= n - k
        )
        row = out[q]
        assert row.n == n and row.k_thresh == k
        assert row.n_upper_joint == upper
        assert row.n_lower_joint == lower
        assert row.lambda_upper == pytest.approx(upper / (n - k), abs=1e-6)
        assert row.lambda_lower == pytest.approx(lower / (n - k), abs=1e-6)
    # comonotone data: joint-tail mass far above the independence level
    assert out[0.8].lambda_upper > 0.4


# --------------------------------------------------------- SPRT


def test_sprt_matches_decimal_walk(spark):
    rng = random.Random(31)
    t0 = datetime(2024, 5, 1)
    rows = []
    for i in range(400):
        arm = i % 2
        p = 0.55 if arm == 0 else 0.25
        rows.append(
            Row(
                arm=arm,
                ts=t0 + timedelta(minutes=i),
                id=i,
                succ=rng.random() < p,
            )
        )
    p0, p1, alpha, beta = 0.3, 0.5, 0.05, 0.05
    out = {
        r.arm: r
        for r in evaluation.sprt_ab(
            spark.createDataFrame(rows),
            arm_col="arm",
            ts_col="ts",
            id_col="id",
            success_col="succ",
            p0=p0,
            p1=p1,
            alpha=alpha,
            beta=beta,
        ).collect()
    }
    # ---- independent replay: Decimal walk, same rounded constants ----
    c1 = Decimal(f"{round(math.log(p1 / p0), 12):.12f}")
    c2 = Decimal(f"{round(math.log((1 - p1) / (1 - p0)), 12):.12f}")
    a_up = Decimal(f"{round(math.log((1 - beta) / alpha), 12):.12f}")
    b_lo = Decimal(f"{round(math.log(beta / (1 - alpha)), 12):.12f}")
    for arm in (0, 1):
        seq = sorted(
            (r for r in rows if r.arm == arm), key=lambda r: (r.ts, r.id)
        )
        llr = Decimal(0)
        k = 0
        decision, n_dec, llr_dec = "continue", None, None
        for i, r in enumerate(seq, start=1):
            if r.succ:
                k += 1
                llr += c1
            else:
                llr += c2
            if n_dec is None and (llr >= a_up or llr <= b_lo):
                n_dec = i
                llr_dec = llr
                decision = "accept_h1" if llr >= a_up else "accept_h0"
        row = out[arm]
        assert row.n_obs == len(seq) and row.n_success == k
        assert row.llr_final == pytest.approx(float(llr), abs=1e-6)
        assert row.decision == decision
        assert row.n_decision == n_dec
        if n_dec is not None:
            assert row.llr_decision == pytest.approx(float(llr_dec), abs=1e-6)
    # the planted rates are on opposite sides of (p0, p1): arm 0
    # accepts H1, arm 1 accepts H0 — both cross, in finite samples
    assert out[0].decision == "accept_h1"
    assert out[1].decision == "accept_h0"


def test_sprt_no_crossing_yields_continue(spark):
    # two observations can't reach either boundary at these settings
    t0 = datetime(2024, 5, 1)
    rows = [
        Row(arm=0, ts=t0, id=1, succ=True),
        Row(arm=0, ts=t0 + timedelta(minutes=1), id=2, succ=False),
    ]
    out = evaluation.sprt_ab(
        spark.createDataFrame(rows),
        arm_col="arm",
        ts_col="ts",
        id_col="id",
        success_col="succ",
        p0=0.4,
        p1=0.6,
    ).collect()[0]
    assert out.decision == "continue"
    assert out.n_decision is None and out.llr_decision is None


# ------------------------------------------------------ hypothesis properties

from hypothesis import HealthCheck, given, settings, strategies as st


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 9)),
        min_size=8,
        max_size=30,
    ).filter(lambda xs: len({g for g, _ in xs}) >= 2)
)
def test_quantile_normalization_partitions_each_group(spark, data):
    """Bins within a group differ by <= 1 row and sum to the group
    size; the reference value is the across-group mean of that bin's
    group means — on ARBITRARY tie-heavy inputs."""
    rows = [Row(id=i, g=g, v=float(v)) for i, (g, v) in enumerate(data)]
    out = agg.quantile_normalization(
        spark.createDataFrame(rows), group_col="g", value_col="v",
        id_col="id", n_bins=4,
    ).collect()
    sizes: dict[str, list[int]] = {}
    by_bin: dict[int, list[float]] = {}
    for r in out:
        sizes.setdefault(r.grp, []).append(r.n_rows)
        by_bin.setdefault(r.bin, []).append(r.group_mean)
    for g, ns in sizes.items():
        assert sum(ns) == sum(1 for row in rows if row.g == g)
        assert max(ns) - min(ns) <= 1
    for r in out:
        ref = sum(by_bin[r.bin]) / len(by_bin[r.bin])
        assert r.ref_value == pytest.approx(ref, abs=1e-5)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(0, 1000), min_size=12, max_size=40, unique=True))
def test_tail_dependence_is_one_on_comonotone_data(spark, xs):
    """If y is a monotone transform of x, both measures are extreme
    together by construction: lambda_U = lambda_L = 1 at every q."""
    rows = [Row(id=i, x=float(v), y=float(2 * v + 1)) for i, v in enumerate(xs)]
    out = agg.tail_dependence(
        spark.createDataFrame(rows), x_col="x", y_col="y", id_col="id",
        quantiles=(0.5, 0.9),
    ).collect()
    for r in out:
        assert r.lambda_upper == pytest.approx(1.0)
        assert r.lambda_lower == pytest.approx(1.0)
        assert 0 <= r.n_upper_joint <= r.n


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from("xy"), st.sampled_from("pqr")),
        min_size=10,
        max_size=40,
    )
)
def test_mutual_information_bounds(spark, data):
    """0 <= MI <= min(H(X), H(Y)) within quantization tolerance, on
    arbitrary categorical pairs."""
    rows = [Row(x=x, y=y) for x, y in data]
    out = agg.mutual_information(
        spark.createDataFrame(rows), x_col="x", y_col="y"
    ).collect()[0]
    assert out.mi >= -1e-6
    assert out.mi <= min(out.h_x, out.h_y) + 1e-6
    assert out.h_xy <= out.h_x + out.h_y + 1e-6
    # a constant column (H = 0) NULL-propagates the normalized forms
    if out.h_x == 0 or out.h_y == 0:
        assert out.nmi is None
    else:
        assert -1e-6 <= out.nmi <= 1 + 1e-6


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.booleans(), min_size=5, max_size=60))
def test_sprt_llr_final_is_the_closed_form(spark, succ):
    """llr_final always equals k*C1 + (n-k)*C2 with the rounded
    constants — the walk's endpoint is path-independent."""
    t0 = datetime(2024, 1, 1)
    rows = [
        Row(arm=0, ts=t0 + timedelta(minutes=i), id=i, succ=s)
        for i, s in enumerate(succ)
    ]
    p0, p1 = 0.3, 0.6
    out = evaluation.sprt_ab(
        spark.createDataFrame(rows), arm_col="arm", ts_col="ts",
        id_col="id", success_col="succ", p0=p0, p1=p1,
    ).collect()[0]
    k = sum(succ)
    c1 = round(math.log(p1 / p0), 12)
    c2 = round(math.log((1 - p1) / (1 - p0)), 12)
    assert out.llr_final == pytest.approx(
        k * c1 + (len(succ) - k) * c2, abs=1e-6
    )
    assert out.n_success == k and out.n_obs == len(succ)


def test_heaps_law_degenerate_walks_null_propagate(spark):
    # vocabulary that never grows -> vy = 0 exactly -> no r2;
    # token counts still vary -> vx > 0 -> beta/k still fit
    rows = [Row(doc_id=1, text="a a"), Row(doc_id=2, text="a a a")]
    out = textops.heaps_law(spark.createDataFrame(rows)).collect()[0]
    assert out.vocab_size == 1
    assert out.r2 is None
    assert out.beta == pytest.approx(0.0, abs=1e-6)  # flat V: slope 0


def test_parameter_contracts_raise_early(spark):
    df = spark.createDataFrame([Row(id=1, x=1.0, y=2.0, g="a", ts=datetime(2024, 1, 1), s=True)])
    with pytest.raises(ValueError, match="strictly inside"):
        agg.tail_dependence(
            df, x_col="x", y_col="y", id_col="id", quantiles=(0.9, 1.0)
        )
    with pytest.raises(ValueError, match="prior_weight"):
        evaluation.oof_target_encoding(
            df, key_col="g", target_col="x", id_col="id", prior_weight=0.0
        )
    with pytest.raises(ValueError, match="p0"):
        evaluation.sprt_ab(
            df, arm_col="g", ts_col="ts", id_col="id", success_col="s",
            p0=0.5, p1=0.5,
        )
    with pytest.raises(ValueError, match="DECIMAL"):
        evaluation.sprt_ab(
            df, arm_col="g", ts_col="ts", id_col="id", success_col="s",
            p0=0.5, p1=0.6, alpha=1e-6, beta=1e-6,
        )
    # round-9 ADVICE: alpha/beta get the same contract guard as p0/p1
    # (alpha=0 used to raise ZeroDivisionError; alpha>=1 a bare
    # math-domain error)
    for a, b in ((0.0, 0.1), (1.0, 0.1), (0.05, 0.0), (0.05, 1.5)):
        with pytest.raises(ValueError, match="alpha"):
            evaluation.sprt_ab(
                df, arm_col="g", ts_col="ts", id_col="id", success_col="s",
                p0=0.4, p1=0.6, alpha=a, beta=b,
            )


def test_tail_dependence_dedupes_quantiles(spark):
    """Round-9 ADVICE: duplicate quantiles used to crossJoin two
    copies that collapse into one groupBy('q') group, doubling the
    joint counts so lambda could exceed 1."""
    rows = [Row(id=i, x=float(i), y=float(i)) for i in range(20)]
    df = spark.createDataFrame(rows)
    dup = agg.tail_dependence(
        df, x_col="x", y_col="y", id_col="id", quantiles=(0.8, 0.8, 0.8)
    ).collect()
    ref = agg.tail_dependence(
        df, x_col="x", y_col="y", id_col="id", quantiles=(0.8,)
    ).collect()
    assert len(dup) == 1
    assert dup[0].asDict() == ref[0].asDict()
    assert dup[0].lambda_upper <= 1.0
