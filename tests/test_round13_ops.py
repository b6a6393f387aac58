"""Round-13 operator batch: Chao1 unseen-vocabulary bound, Hill
tail-index, delete-one-shard jackknife (theil_sen / mann_kendall live
in test_evaluation.py with the rest of the eval family).

Novel-algebra entries carry their INDEPENDENT reference test (the
q244-lesson checklist rule: the oracle replays the same algebra, so a
mirror-symmetric bug would hash green — only a from-scratch
reimplementation catches it):
  * chao1_vocab   -> collections.Counter count-of-counts + the
    closed-form arithmetic in plain floats;
  * hill_tail_index -> python sorted() order statistics with
    math.log, no decimal quantization;
  * jackknife_shard_variance -> hashlib.md5 shard replay + plain
    float leave-one-out arithmetic.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from pyspark.sql import Row, functions as F

from nyc_taxi_data_prediction_pyspark_spark.catalog import load
from nyc_taxi_data_prediction_pyspark_spark.operators import aggregates as agg
from nyc_taxi_data_prediction_pyspark_spark.operators import text as textops

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------- chao1_vocab


def test_chao1_hand_computed(spark):
    # unigram counts a:1 b:1 c:2 d:3 -> s_obs=4 f1=2 f2=1 N=7
    # chao1 = 4 + 2*1/(2*(1+1)) = 4.5 ; coverage = 1 - 2/7
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c"), Row(doc_id=2, text="c d d"),
         Row(doc_id=3, text="d")]
    )
    r = textops.chao1_vocab(docs, ngram_n=1).collect()[0]
    assert (r.s_obs, r.f1, r.f2, r.n_grams) == (4, 2, 1, 7)
    assert r.chao1 == 4.5
    assert r.coverage == round(1.0 - 2.0 / 7.0, 6)


def test_chao1_counter_reference_on_testdata(spark):
    docs = load(spark, SF, "documents")
    got = textops.chao1_vocab(docs, ngram_n=5).collect()[0]
    rows = docs.select("text").collect()
    counts: Counter = Counter()
    for row in rows:
        toks = " ".join((row.text or "").lower().split()).split(" ")
        toks = [t for t in toks if t]
        if not toks:
            continue
        for i in range(len(toks) - 4):
            counts[" ".join(toks[i:i + 5])] += 1
    s_obs = len(counts)
    f1 = sum(1 for v in counts.values() if v == 1)
    f2 = sum(1 for v in counts.values() if v == 2)
    n = sum(counts.values())
    assert (got.s_obs, got.f1, got.f2, got.n_grams) == (s_obs, f1, f2, n)
    assert got.chao1 == round(s_obs + f1 * (f1 - 1) / (2 * (f2 + 1)), 6)
    assert got.coverage == round(1.0 - f1 / n, 6)


# ------------------------------------------------------ hill_tail_index


def test_hill_known_answer(spark):
    # frequencies 8,4,2,1 and k=2: threshold = 3rd-ranked freq = 2,
    # H = (ln(8/2)+ln(4/2))/2 = 3ln2/2, alpha = 2/(3ln2)
    words = ["t1"] * 8 + ["t2"] * 4 + ["t3"] * 2 + ["t4"]
    docs = spark.createDataFrame([Row(doc_id=1, text=" ".join(words))])
    r = textops.hill_tail_index(docs, ngram_n=1, k=2).collect()[0]
    assert r.k == 2 and r.threshold == 2
    assert r.hill_h == round(3 * math.log(2) / 2, 6)
    assert r.hill_alpha == round(2 / (3 * math.log(2)), 6)


def test_hill_sorted_reference_on_testdata(spark):
    docs = load(spark, SF, "documents")
    got = textops.hill_tail_index(docs, ngram_n=2, k=100).collect()[0]
    rows = docs.select("text").collect()
    counts: Counter = Counter()
    for row in rows:
        toks = " ".join((row.text or "").lower().split()).split(" ")
        toks = [t for t in toks if t]
        for i in range(len(toks) - 1):
            counts[" ".join(toks[i:i + 2])] += 1
    # total order (freq DESC, token ASC)
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert len(ordered) >= 101
    rk1 = ordered[100][1]
    h = sum(math.log(r / rk1) for _, r in ordered[:100]) / 100
    assert got.threshold == rk1
    assert abs(got.hill_h - h) <= 1e-6
    assert abs(got.hill_alpha - 1.0 / h) <= 1e-6


# ------------------------------------- jackknife_shard_variance


def _md5_int60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_jackknife_md5_replay_on_testdata(spark):
    docs = load(spark, SF, "documents")
    toks = docs.where(
        F.length(textops.normalize_text("text")) > 0
    ).select(
        "doc_id",
        F.size(F.split(textops.normalize_text("text"), " "))
        .cast("bigint")
        .alias("v"),
    )
    got = agg.jackknife_shard_variance(
        toks, id_col="doc_id", value_col="v", shards=16, salt="jack-v1"
    ).collect()[0]
    rows = toks.collect()
    shards: dict = {}
    for r in rows:
        sh = _md5_int60("jack-v1" + str(r.doc_id)) % 16
        n, s = shards.get(sh, (0, 0))
        shards[sh] = (n + 1, s + r.v)
    g = len(shards)
    nn = sum(n for n, _ in shards.values())
    ss = sum(s for _, s in shards.values())
    loo = [(ss - s) / (nn - n) for n, s in shards.values()]
    mbar = sum(loo) / g
    var = (g - 1) / g * sum((m - mbar) ** 2 for m in loo)
    assert (got.g, got.n_rows) == (g, nn)
    assert got.mean == round(ss / nn, 6)
    assert abs(got.var_jack - var) <= 1e-6
    assert abs(got.se_jack - math.sqrt(var)) <= 1e-6


def test_jackknife_constant_values_zero_variance(spark):
    rows = [Row(doc_id=i, v=5) for i in range(200)]
    got = agg.jackknife_shard_variance(
        spark.createDataFrame(rows), id_col="doc_id", value_col="v"
    ).collect()[0]
    assert got.mean == 5.0
    assert got.var_jack == 0.0 and got.se_jack == 0.0
    assert got.n_rows == 200
