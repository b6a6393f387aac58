"""Corpus-preparation operators added in round 2: decontamination,
repetition signals, PII redaction, mixture sampling, shard writing.
Each also has a full DuckDB oracle (q93-q97); these tests pin the
operator semantics on crafted inputs the synthetic corpus can't
exercise."""

from __future__ import annotations

import pyspark.sql.functions as F

from nyc_taxi_data_prediction_pyspark_spark.operators import dedup, similarity, text as textops


def test_decontaminate_flags_exact_and_partial_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words about spark engines here"),
            (3, "the quick brown fox appears again in this doc"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup.decontaminate(train, eval_df).collect()}
    # doc 2 shares nothing → absent; docs 1 and 3 share 3-grams
    assert set(out) == {1, 3}
    # doc 1 contains all 3 eval shingles; 7 distinct shingles of its own
    assert out[1]["n_shared"] == 3
    assert out[1]["contamination"] == 3 / out[1]["n_shingles"]
    # doc 3 shares only 'the quick brown' / 'quick brown fox'
    assert out[3]["n_shared"] == 2


def test_repetition_signals_detects_degenerate_text(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),          # one bigram repeated 4x
            (2, "all distinct words appear once only"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.repetition_signals(df).collect()}
    assert out[1]["n_grams"] == 4
    assert out[1]["top_gram_frac"] == 1.0
    assert out[1]["dup_gram_frac"] == 1.0
    assert out[2]["n_grams"] == 5
    assert out[2]["top_gram_frac"] == 1 / 5
    assert out[2]["dup_gram_frac"] == 0.0


def test_redact_pii_scrubs_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@example.co or call 5551234567 now"),
            (2, "no pii here, just 123 and a word"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.redact_pii(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_long_digits"] == 1
    assert out[1]["redacted"] == "mail me at <EMAIL> or call <NUM> now"
    assert out[2]["n_emails"] == 0 and out[2]["n_long_digits"] == 0
    assert out[2]["redacted"] == "no pii here, just 123 and a word"


def test_mixture_sample_is_deterministic_and_weight_monotone(spark, sf_dir):
    from nyc_taxi_data_prediction_pyspark_spark.catalog import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    w_hi = {"en": 0.9, "es": 0.9, "fr": 0.9, "de": 0.9, "zh": 0.9}
    w_lo = {k: 0.3 for k in w_hi}
    hi1 = {r["doc_id"] for r in textops.mixture_sample(docs, w_hi).collect()}
    hi2 = {r["doc_id"] for r in textops.mixture_sample(docs, w_hi).collect()}
    lo = {r["doc_id"] for r in textops.mixture_sample(docs, w_lo).collect()}
    assert hi1 == hi2                     # same seedless draw every run
    assert lo <= hi1                      # lower weight ⊂ higher weight
    n = docs.count()
    assert 0.8 * n < len(hi1) < n         # ≈90% kept
    assert 0.2 * n < len(lo) < 0.4 * n    # ≈30% kept
    # unknown group defaults to weight 0 → dropped
    extra = spark.createDataFrame([(10_000_000, "xx")], "doc_id long, lang string")
    assert textops.mixture_sample(extra, w_hi).count() == 0


def test_write_training_shards_roundtrip(spark, sf_dir, tmp_path):
    from nyc_taxi_data_prediction_pyspark_spark.pipelines.training_data import (
        build_training_set,
        shard_manifest,
        with_shards,
        write_training_shards,
    )

    training = build_training_set(spark, sf_dir)
    path = str(tmp_path / "shards")
    manifest = {
        r["shard_id"]: r for r in write_training_shards(training, path, packs_per_shard=8).collect()
    }
    back = spark.read.parquet(path)
    # partition layout: shard_id is a hive partition column
    got = {
        r["shard_id"]: r
        for r in back.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"), F.sum("n_tokens").alias("n_tokens"))
        .collect()
    }
    assert set(got) == set(manifest) and len(got) > 1
    for sid, m in manifest.items():
        assert got[sid]["n_chunks"] == m["n_chunks"]
        assert got[sid]["n_tokens"] == m["n_tokens"]
    # reading ONE shard prunes partitions (loader-rank access pattern)
    from nyc_taxi_data_prediction_pyspark_spark.plans import explain

    one = back.where(F.col("shard_id") == sorted(got)[0])
    assert any("shard_id" in p for p in explain.partition_filters(one))
    # within a shard, data comes back in pack order per file
    rows = one.collect()
    assert rows == sorted(rows, key=lambda r: (r["pack_id"], r["pack_offset"]))


def test_zorder_key_bit_interleave(spark):
    from nyc_taxi_data_prediction_pyspark_spark.functions.zorder import zorder_key

    df = spark.createDataFrame(
        [(0b1010, 0b0101), (0, 0), (1, 0), (0, 1), (65535, 65535)], "a long, b long"
    )
    got = [r["z"] for r in df.select(zorder_key("a", "b").alias("z")).collect()]
    # a owns even bit positions, b odd: a=1010,b=0101 → z=01100110
    assert got[0] == 0b01100110
    assert got[1] == 0
    assert got[2] == 1          # a bit0 → z bit0
    assert got[3] == 2          # b bit0 → z bit1
    assert got[4] == (1 << 32) - 1


def test_zorder_sort_bounds_both_dims_per_file(spark, tmp_path):
    """The point of z-clustering: after sorting by zkey, every
    contiguous block bounds BOTH dimensions — unlike a single-column
    sort, where the second dim spans its full range in every block."""
    import pyspark.sql.functions as F2
    from nyc_taxi_data_prediction_pyspark_spark.functions.zorder import zorder_key

    n = 64
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    ).withColumn("z", zorder_key("x", "y", bits=6))
    blocks = (
        df.withColumn("blk", F2.floor(F2.col("z") / 256))
        .groupBy("blk")
        .agg(
            (F2.max("x") - F2.min("x")).alias("span_x"),
            (F2.max("y") - F2.min("y")).alias("span_y"),
        )
        .collect()
    )
    # every 256-key z-block is a 16x16 tile: both spans tiny vs n-1
    assert all(r["span_x"] <= 15 and r["span_y"] <= 15 for r in blocks)
    assert len(blocks) == 16


# ---------------------------------------------------------------- property

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st


@pytest.fixture(scope="session")
def spark_h(spark):
    return spark


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=60),
    st.sampled_from([1, 3, 8]),
    st.sampled_from([64, 512]),
)
def test_pack_documents_property(spark_h, tokens, n_parts, seq_len):
    """For ARBITRARY token counts and partition counts: two-phase ==
    single-window bit-for-bit, offsets < seq_len, and consecutive
    starts differ by exactly the intervening doc's tokens."""
    from nyc_taxi_data_prediction_pyspark_spark.operators.text import pack_documents

    df = spark_h.createDataFrame(
        list(enumerate(tokens)), "doc_id long, n_tokens long"
    )
    two = sorted(
        map(tuple, pack_documents(df, seq_len=seq_len, num_partitions=n_parts).collect())
    )
    one = sorted(map(tuple, pack_documents(df, seq_len=seq_len, two_phase=False).collect()))
    assert two == one
    # reconstruct starts and check the prefix-sum law
    starts = [pid * seq_len + off for (_, _, pid, off) in two]
    for i in range(1, len(starts)):
        assert starts[i] - starts[i - 1] == tokens[i - 1]
    assert all(0 <= off < seq_len for (_, _, _, off) in two)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(0, 65535), st.integers(0, 65535)), min_size=1, max_size=50))
def test_zorder_key_deinterleaves_property(spark_h, pairs):
    """The Spark bitwise expression agrees with an independent Python
    bit-extraction for arbitrary 16-bit pairs (round-trip: both
    coordinates recover exactly from the key)."""
    from nyc_taxi_data_prediction_pyspark_spark.functions.zorder import zorder_key

    df = spark_h.createDataFrame(pairs, "a long, b long")
    got = df.select("a", "b", zorder_key("a", "b").alias("z")).collect()
    for r in got:
        a = sum(((r["z"] >> (2 * b)) & 1) << b for b in range(16))
        b_ = sum(((r["z"] >> (2 * b + 1)) & 1) << b for b in range(16))
        assert (a, b_) == (r["a"], r["b"])


def _dsir_reference(rows, buckets=4096):
    """Plain-Python replay of text.dsir_importance (md5 buckets,
    add-one smoothing, DECIMAL(28,12)-quantized log-ratio terms)."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def bkt(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % buckets

    feats = []  # (doc_id, tgt, bucket)
    for doc_id, text, tgt in rows:
        toks = [t for t in text.lower().split() if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        feats.extend((doc_id, tgt, bkt(g)) for g in grams)
    ct, cr = {}, {}
    for _, tgt, b in feats:
        (ct if tgt else cr)[b] = (ct if tgt else cr).get(b, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    out = {}
    for doc_id, tgt, b in feats:
        lr = math.log(
            ((ct.get(b, 0) + 1) * (tr + buckets))
            / ((cr.get(b, 0) + 1) * (tt + buckets))
        )
        q = Decimal(repr(lr)).quantize(Decimal("1E-12"), rounding=ROUND_HALF_UP)
        s, c = out.get(doc_id, (Decimal(0), 0))
        out[doc_id] = (s + q, c + 1)
    return {
        d: (c, round(float(s) / c, 6)) for d, (s, c) in out.items()
    }


def test_dsir_importance_matches_reference_and_orders_domains(spark):
    rows = [
        (1, "spark shuffle join agg", True),
        (2, "spark shuffle window agg", True),
        (3, "weather rain humidity wind", False),
        (4, "spark shuffle join window", False),   # target-like raw doc
        (5, "rain wind rain wind", False),         # raw-like raw doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_target"])
    got = {
        r["doc_id"]: (r["n_feats"], r["avg_logratio"])
        for r in textops.dsir_importance(
            df, text_col="text", id_col="doc_id", target_col="is_target"
        ).collect()
    }
    ref = _dsir_reference(rows)
    assert got == ref
    # the target-like raw doc must outscore the raw-like raw doc
    assert got[4][1] > got[5][1]


def test_corpus_gate_report_absent_signal_semantics(spark):
    rows = [
        # passes everything: English stopwords, 30+ distinct-ish tokens
        (1, "the cat and the dog went to the park and it is nice " + " ".join(f"w{i}" for i in range(20))),
        (2, "el la de que los " * 8),          # Spanish -> fails lang
        (3, "the and of to is " * 8),          # heavy bigram repetition
        (4, "x"),                               # 1 token: no bigrams (rep passes vacuously), fails length
        (5, " "),                               # no tokens: nll gate must FAIL
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in textops.corpus_gate_report(
            df, keep_lang="en", max_dup_gram_frac=0.3,
            min_tokens=5, max_tokens=100, max_avg_nll=50.0,
        ).collect()
    }
    assert out[1]["pass_lang"] and out[1]["pass_all"]
    assert not out[2]["pass_lang"] and not out[2]["pass_all"]
    assert not out[3]["pass_rep"]           # dup_gram_frac ~ 1
    assert out[4]["pass_rep"]               # no bigrams -> vacuous pass
    assert not out[4]["pass_len"]
    assert not out[5]["pass_nll"] and not out[5]["pass_all"]


def test_vocab_coverage_oov_rates(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common common rare1"),
            (2, "common other other rare2 rare3"),
            (3, "common other"),
        ],
        ["doc_id", "text"],
    )
    # top-2 vocab by frequency: common(5), other(3)
    out = {
        r["doc_id"]: r
        for r in textops.vocab_coverage(docs, top_v=2).collect()
    }
    assert (out[1]["n_tokens"], out[1]["n_oov"]) == (4, 1)
    assert (out[2]["n_tokens"], out[2]["n_oov"]) == (5, 2)
    assert (out[3]["n_tokens"], out[3]["n_oov"]) == (2, 0)
    assert out[3]["oov_rate"] == 0.0
    assert abs(out[1]["oov_rate"] - 0.25) < 1e-12
    # deterministic tie-break: with top_v=3, 'rare1'..'rare3' tie at 1;
    # lexicographically smallest (rare1) enters the vocab
    out3 = {
        r["doc_id"]: r["n_oov"]
        for r in textops.vocab_coverage(docs, top_v=3).collect()
    }
    assert out3 == {1: 0, 2: 2, 3: 0}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
def test_duplicate_span_coverage_matches_bruteforce(spark_h, texts):
    """For ARBITRARY tiny corpora over a 2-token alphabet (maximal
    span collisions): the operator equals a Python brute force on
    every counter, and the structural invariants hold."""
    from nyc_taxi_data_prediction_pyspark_spark.operators.dedup import (
        duplicate_span_coverage,
    )

    n = 3
    df = spark_h.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["n_dup_spans"], r["covered_tokens"])
        for r in duplicate_span_coverage(df, n=n).collect()
    }
    # brute force
    toks = {i: (t.split(" ") if t.strip() else [""]) for i, t in enumerate(texts)}
    spans = {}  # key -> [(doc, pos)]
    for i, ws in toks.items():
        for p in range(len(ws) - n + 1):
            spans.setdefault(tuple(ws[p : p + n]), []).append((i, p))
    dup_positions = {}
    dup_counts = {}
    for key, occ in spans.items():
        if len(occ) > 1:
            for d, p in occ:
                dup_counts[d] = dup_counts.get(d, 0) + 1
                dup_positions.setdefault(d, set()).update(range(p, p + n))
    for i, ws in toks.items():
        want = (
            len(ws),
            max(len(ws) - n + 1, 0),
            dup_counts.get(i, 0),
            len(dup_positions.get(i, set())),
        )
        assert got[i] == want, (i, got[i], want)
        # invariants
        assert got[i][3] <= got[i][0] and got[i][2] <= got[i][1]


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 10**6), min_size=2, max_size=40, unique=True),
    st.sampled_from([2, 3]),
)
def test_mixture_interleave_is_a_wfq_schedule(spark_h, ids, ratio):
    """For arbitrary id sets split across two sources at weight ratio
    r:1 — positions are a permutation of 0..n-1, per-source order
    follows the md5 key order, and in any prefix the heavy source
    leads by at most its fair share bound."""
    from nyc_taxi_data_prediction_pyspark_spark.operators.text import (
        mixture_interleave,
    )

    rows = [(i, "heavy" if k % 2 == 0 else "light") for k, i in enumerate(ids)]
    df = spark_h.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["global_pos"], r["source"], r["doc_id"])
        for r in mixture_interleave(
            df, source_col="source", id_col="doc_id",
            weights={"heavy": float(ratio), "light": 1.0},
        ).collect()
    )
    n = len(rows)
    assert [g for g, _, _ in got] == list(range(n))
    # rate law: after ANY prefix, heavy count >= floor(ratio/(ratio+1) *
    # prefix) - slack of one WFQ round
    heavy_total = sum(1 for _, s in rows if s == "heavy")
    seen_heavy = 0
    for pos, (g, s, _) in enumerate(got, start=1):
        if s == "heavy":
            seen_heavy += 1
        if seen_heavy < heavy_total:  # rate law only binds while heavy remains
            assert seen_heavy >= (ratio * pos) // (ratio + 1) - ratio


def test_bm25_matches_reference_and_ranks_sensibly(spark):
    import math
    from decimal import ROUND_HALF_UP, Decimal

    rows = [
        (1, "spark shuffle spark join"),
        (2, "spark weather rain"),
        (3, "rain rain rain rain rain rain rain rain"),
        (4, "nothing relevant here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    q = ["spark", "rain"]
    got = {
        r["doc_id"]: (r["n_matched_terms"], r["bm25"])
        for r in textops.bm25_scores(df, q, k1=1.2, b=0.75).collect()
    }
    # Python reference with the identical quantization
    docs = {i: t.split() for i, t, in ((r[0], r[1]) for r in rows)}
    n = len(docs)
    avg = sum(len(v) for v in docs.values()) / n
    dfreq = {t: sum(1 for v in docs.values() if t in v) for t in q}
    want = {}
    for i, toks in docs.items():
        s = Decimal(0)
        m = 0
        for t in q:
            tf = toks.count(t)
            if tf == 0:
                continue
            m += 1
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            c = idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len(toks) / avg))
            s += Decimal(repr(c)).quantize(Decimal("1E-12"), rounding=ROUND_HALF_UP)
        if m:
            want[i] = (m, round(float(s), 6))
    assert got == want
    assert 4 not in got                       # no matching term -> absent
    # doc2 matches BOTH query terms -> two idf contributions beat
    # doc1's single saturating term
    assert got[2][1] > got[1][1]
    # rain-flooded doc3: tf saturation keeps it bounded, still positive
    assert got[3][1] > 0 and all(v[1] > 0 for v in got.values())


def test_rrf_fuse_merges_rankings(spark):
    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], ["vec_id", "rank"])
    b = spark.createDataFrame([(12, 1), (10, 2), (13, 3)], ["vec_id", "rank"])
    out = similarity.rrf_fuse([a, b], k=60, top=4).collect()
    rows = {r["vec_id"]: (r["n_lists"], r["rrf_score"]) for r in out}
    # ids in both lists dominate ids in one
    assert rows[10][0] == 2 and rows[12][0] == 2
    assert rows[10][1] > rows[11][1] and rows[12][1] > rows[13][1]
    # exact values: 1/61 + 1/62 etc., quantized then summed
    from decimal import ROUND_HALF_UP, Decimal

    def q12(x):
        return Decimal(repr(x)).quantize(Decimal("1E-12"), rounding=ROUND_HALF_UP)

    assert rows[10][1] == round(float(q12(1 / 61) + q12(1 / 62)), 9)
    # the fused order is deterministic: 10 before 12 iff score(10) > score(12)
    order = [r["vec_id"] for r in out]
    assert order == sorted(order, key=lambda i: (-rows[i][1], i))


def test_dsir_importance_degenerate_corpora_do_not_crash(spark):
    # all-target: raw totals are 0 -> smoothing keeps every term finite
    rows = [(1, "a b", True), (2, "b c", True)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_target"])
    out = textops.dsir_importance(df).collect()
    assert len(out) == 2 and all(r["avg_logratio"] is not None for r in out)
    # all-raw: symmetric
    rows2 = [(1, "a b", False), (2, "b c", False)]
    out2 = textops.dsir_importance(
        spark.createDataFrame(rows2, ["doc_id", "text", "is_target"])
    ).collect()
    assert len(out2) == 2 and all(r["avg_logratio"] is not None for r in out2)


def test_luhn_card_flags(spark):
    rows = [
        (1, "pay with 4532015112830366 now"),        # valid Visa test number
        (2, "order 4532015112830367 shipped"),       # same digits, bad check
        (3, "call 5551234 soon"),                    # too short: no run
        (4, "id 79927398713xx and 79927398710"),     # 11 digits: too short
        (5, "card 378282246310005 works"),           # valid Amex test number (15)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["digit_run"]): r["luhn_valid"]
        for r in textops.luhn_card_flags(df).collect()
    }
    assert got[(1, "4532015112830366")] is True
    assert got[(2, "4532015112830367")] is False
    assert got[(5, "378282246310005")] is True
    assert not [k for k in got if k[0] in (3, 4)]  # short runs never surface
    # maximal-run rule: a 20-digit timestamp/id is NOT truncated to a
    # 19-digit prefix and Luhn-checked (the [0-9]{13,19} bug — a
    # 20-zero id's prefix would pass Luhn and false-flag)
    over = spark.createDataFrame(
        [(9, "ts 20260814123045991234 end"), (10, "id 00000000000000000000 x")],
        ["doc_id", "text"],
    )
    assert textops.luhn_card_flags(over).count() == 0


def test_bm25_counts_empty_docs_in_corpus_stats(spark):
    """N and avg length cover the WHOLE corpus — an empty doc shifts
    idf exactly per the formula instead of silently shrinking N."""
    import math

    rows = [(1, "spark spark"), (2, "spark rain"), (3, "   ")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["bm25"] for r in textops.bm25_scores(df, ["spark"]).collect()}
    n, avg = 3, (2 + 2 + 0) / 3  # empty doc counted with length 0
    idf = math.log(1.0 + (n - 2 + 0.5) / (2 + 0.5))
    c1 = idf * (2 * 2.2) / (2 + 1.2 * (1 - 0.75 + 0.75 * 2 / avg))
    assert abs(got[1] - round(c1, 6)) < 1e-9
    assert 3 not in got


def _bpe_reference(word_counts, n_merges):
    """Pure-Python BPE (Sennrich ACL'16) with the operator's tie-break:
    count DESC, then (left, right) lexicographic ASC."""
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in word_counts.items()}
    rules = []
    for step in range(1, n_merges + 1):
        counts = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (left, right), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((step, left, right, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return rules, vocab


def test_bpe_fit_matches_reference(spark):
    rows = [
        (1, "low lower lowest low low"),
        (2, "newer newest new low widest wide"),
        (3, "wider wide wide new newer"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = textops.bpe_fit(df, n_merges=6)

    wc = {}
    for _i, t in rows:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want, _ = _bpe_reference(wc, 6)
    assert got == want
    # greedy non-overlap: a run of the same pair merges left-to-right
    run = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    r = textops.bpe_fit(run, n_merges=1)
    assert r == [(1, "a", "a", 6)]  # 3 adjacent pairs per word x 2 words


def test_bpe_segment_stats_applies_rules_in_order(spark):
    rows = [(1, "low lower low new newer")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rules = textops.bpe_fit(df, n_merges=4)
    stats = {r["word_chars"]: r for r in textops.bpe_segment_stats(df, rules).collect()}

    wc = {}
    for w in rows[0][1].split():
        wc[w] = wc.get(w, 0) + 1
    _, vocab = _bpe_reference(wc, 4)
    by_len = {}
    for syms, c in vocab.items():
        chars = sum(len(s) for s in syms) - len("</w>")
        n, tot = by_len.get(chars, (0, 0))
        by_len[chars] = (n + c, tot + len(syms) * c)
    for chars, (n, tot) in by_len.items():
        assert stats[chars]["n_words"] == n
        assert stats[chars]["total_symbols"] == tot
        assert abs(stats[chars]["avg_symbols"] - tot / n) < 1e-12


def test_stratified_split_exact_quotas_and_determinism(spark, sf_dir):
    from nyc_taxi_data_prediction_pyspark_spark.catalog import load

    docs = load(spark, sf_dir, "documents")
    a = textops.stratified_split(docs).collect()
    b = textops.stratified_split(docs).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # partition: every doc exactly once
    assert len(a) == docs.count()
    assert len({r["doc_id"] for r in a}) == len(a)
    # exact quotas per stratum: floor(n*8/10) train, floor(n*9/10)-train val
    from collections import Counter

    per = Counter((r["lang"], r["split"]) for r in a)
    n_s = Counter(r["lang"] for r in a)
    for lang, n in n_s.items():
        t = n * 8 // 10
        v = n * 9 // 10 - t
        assert per[(lang, "train")] == t, (lang, n)
        assert per[(lang, "val")] == v
        assert per[(lang, "test")] == n - t - v


def test_stratified_split_two_phase_rank_matches_single_window(spark, sf_dir):
    """The composed (bucket-local rank + offset) order must equal one
    global per-stratum sort by (bucket, hash, id)."""
    import hashlib

    from nyc_taxi_data_prediction_pyspark_spark.catalog import load

    docs = load(spark, sf_dir, "documents")
    got = {r["doc_id"]: r["split"] for r in textops.stratified_split(docs).collect()}

    rows = docs.select("doc_id", "lang").collect()
    by_lang = {}
    for r in rows:
        h = int(hashlib.md5(f"{r['doc_id']}split-v1".encode()).hexdigest()[:15], 16)
        by_lang.setdefault(r["lang"], []).append((h % 32, h, r["doc_id"]))
    want = {}
    for lang, keyed in by_lang.items():
        keyed.sort()
        n = len(keyed)
        for rnk, (_b, _h, did) in enumerate(keyed, 1):
            want[did] = (
                "train" if rnk <= n * 8 // 10 else "val" if rnk <= n * 9 // 10 else "test"
            )
    assert got == want


def test_length_bucket_padding_toy_parity(spark):
    rows = [
        (1, " ".join(["w"] * 5)),    # 5 tokens  -> bucket 16 (floor)
        (2, " ".join(["w"] * 16)),   # 16 tokens -> bucket 16 (exact power)
        (3, " ".join(["w"] * 17)),   # 17 tokens -> bucket 32
        (4, " ".join(["w"] * 100)),  # 100       -> bucket 128
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["bucket_tokens"]: (r["n_docs"], r["sum_tokens"], r["padded_tokens"], r["utilization"])
        for r in textops.length_bucket_padding(df).collect()
    }
    assert got == {
        16: (2, 21, 11, 21 / 32),
        32: (1, 17, 15, 17 / 32),
        128: (1, 100, 28, 100 / 128),
    }


def test_length_bucket_padding_edge_tokens(spark):
    """n<=1 edge guard (round-6 advice): with min_bucket=1, a 1-token
    doc must land in bucket 1 (2^length(bin(0)) would say 2) and an
    empty doc must not evaluate bin(-1)."""
    rows = [
        (1, ""),         # empty string counts as 1 token -> bucket 1
        (2, "w"),        # 1 token  -> bucket 1 (the bin() formula said 2)
        (3, "w w"),      # 2 tokens -> bucket 2
        (4, "w w w"),    # 3 tokens -> bucket 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["bucket_tokens"]: (r["n_docs"], r["sum_tokens"])
        for r in textops.length_bucket_padding(df, min_bucket=1).collect()
    }
    assert got == {1: (2, 2), 2: (1, 2), 4: (1, 3)}


def test_pmi_collocations_hand_computed(spark):
    from nyc_taxi_data_prediction_pyspark_spark.operators.text import pmi_collocations

    # corpus: "a b" x3, "a c" x2, "c c" x1  -> N=12 tokens, B=6 bigrams
    docs = [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c"), (5, "a c"), (6, "c c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r.w1, r.w2): (r.pair_count, r.lift)
        for r in pmi_collocations(df, text_col="text", min_count=1, k=10).collect()
    }
    n, b = 12.0, 6.0
    c = {"a": 5, "b": 3, "c": 4}
    assert out[("a", "b")] == (3, 3 * n * n / (b * c["a"] * c["b"]))
    assert out[("a", "c")] == (2, 2 * n * n / (b * c["a"] * c["c"]))
    assert out[("c", "c")] == (1, 1 * n * n / (b * c["c"] * c["c"]))
    # min_count filters the tail
    filtered = pmi_collocations(df, text_col="text", min_count=3, k=10).collect()
    assert [(r.w1, r.w2) for r in filtered] == [("a", "b")]

    # empty/whitespace-only docs must NOT shift any lift (round-6
    # advice: '' split yields [''] — a phantom unigram that inflated N)
    df2 = spark.createDataFrame(
        docs + [(7, ""), (8, "   ")], "doc_id long, text string"
    )
    out2 = {
        (r.w1, r.w2): (r.pair_count, r.lift)
        for r in pmi_collocations(df2, text_col="text", min_count=1, k=10).collect()
    }
    assert out2 == out


def test_linear_attribution_quota_and_direct(spark):
    import datetime as dt

    from nyc_taxi_data_prediction_pyspark_spark.operators import mining

    base = dt.datetime(2026, 1, 1)
    t = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        # user 1: view, click, view -> purchase (3 touches: 333334/333333/333333
        # by type: view gets 333334+333333, click 333333)
        (1, 1, t(0), "view"), (1, 2, t(1), "click"), (1, 3, t(2), "view"),
        (1, 4, t(3), "purchase"),
        # user 1 second purchase immediately after -> zero touches -> (direct)
        (1, 5, t(4), "purchase"),
        # user 1 trailing view after last purchase -> influences nothing
        (1, 6, t(5), "view"),
        # user 2: single click -> purchase (full ppm to click)
        (2, 7, t(0), "click"), (2, 8, t(1), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string")
    out = {
        r.channel: (r.n_touches, r.n_conversions, r.credit_ppm)
        for r in mining.linear_attribution(
            df, user_col="user_id", ts_col="ts", type_col="event_type",
            id_col="event_id", conversion_type="purchase",
        ).collect()
    }
    assert out["view"] == (2, 1, 333_334 + 333_333)
    assert out["click"] == (2, 2, 333_333 + 1_000_000)
    assert out["(direct)"] == (0, 1, 1_000_000)
    # every conversion's credit sums exactly to ppm
    assert sum(v[2] for v in out.values()) == 3 * 1_000_000


def test_lang_id_eval_kappa_hand_computed(spark):
    from nyc_taxi_data_prediction_pyspark_spark.operators.text import lang_id_eval

    # gold en x4 / fr x2; texts chosen so lang_id predicts
    # en,en,en,fr (for gold en) and fr,en (for gold fr):
    docs = [
        (1, "en", "the cat and the dog"),
        (2, "en", "this is of the essence"),
        (3, "en", "to be and not to be"),
        (4, "en", "le chat est la"),          # misclassified fr
        (5, "fr", "le chien est les des"),
        (6, "fr", "the quick brown fox and"),  # misclassified en
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    out = {r.lang: r for r in lang_id_eval(df, text_col="text", label_col="lang").collect()}
    en, fr = out["en"], out["fr"]
    assert (en.n_true, en.n_pred, en.tp) == (4, 4, 3)
    assert (fr.n_true, fr.n_pred, fr.tp) == (2, 2, 1)
    assert en.precision == 0.75 and en.recall == 0.75 and en.f1 == 0.75
    assert fr.precision == 0.5 and fr.recall == 0.5 and fr.f1 == 0.5
    # kappa = (agree*N - S)/(N^2 - S); agree=4, N=6, S=4*4+2*2=20
    assert en.kappa == (4 * 6 - 20) / (6 * 6 - 20) == 0.25
    assert fr.kappa == en.kappa
