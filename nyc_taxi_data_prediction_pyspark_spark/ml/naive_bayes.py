"""Multinomial Naive Bayes as pure DataFrame algebra — an ML model
whose TRAINING and SCORING are both exactly oracle-checkable.

MLlib's NaiveBayes would give the same mathematics behind a JVM-local
fit (the q29/q39 problem: no external engine can reproduce library
internals). Here the model IS a DataFrame of counts:

    p(tok | class) = (count(tok, class) + 1) / (T_class + V)   (Laplace)
    score(doc, class) = ln p(class) + Σ_tok ln p(tok | class)

Every ln term is quantized to DECIMAL(28,12) BEFORE the distributed
per-(doc, class) sum (the grouped_entropy rule), so scores are
partition-order-independent and bit-comparable across engines; argmax
ties break to the lexicographically smallest class via a min(struct)
selection. Out-of-vocabulary test tokens get the unseen-mass
likelihood 1/(T_class + V) through a left join + coalesce.

Scale shape: the model is a (vocab × classes) count frame — built by
two map-side-combinable aggregations over the exploded train token
stream, joined back to the test token stream on token (AQE broadcasts
a small vocabulary, shuffles a web-scale one; both correct), then one
(doc, class) aggregation. No MLlib, no UDF, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.text import normalize_text

_DEC = "decimal(28,12)"


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(text_col), " ")).alias("__tok"),
    ).where(F.col("__tok") != "")


def nb_train(
    df: DataFrame,
    *,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Fit the model: returns (likelihoods, priors) frames.

    likelihoods: (label, __tok, ln_p) per seen (class, token) plus the
    per-class unseen-mass row is NOT materialized — scorers derive it
    from priors' (t_class, v) columns.
    priors: (label, ln_prior, t_class, v) — one row per class."""
    toks = _tokens(df, id_col, text_col).join(
        df.select(id_col, label_col), id_col
    )
    counts = toks.groupBy(label_col, "__tok").agg(F.count(F.lit(1)).alias("__c"))
    vocab = counts.select("__tok").distinct().count()
    t_class = counts.groupBy(label_col).agg(F.sum("__c").alias("__t"))
    n_docs = df.count()
    doc_counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__nd"))
    priors = doc_counts.join(t_class, label_col).select(
        label_col,
        F.log(F.col("__nd").cast("double") / F.lit(float(n_docs)))
        .cast(_DEC)
        .alias("ln_prior"),
        F.col("__t").alias("t_class"),
        F.lit(vocab).alias("v"),
    )
    like = counts.join(t_class, label_col).select(
        label_col,
        "__tok",
        F.log(
            (F.col("__c") + 1).cast("double") / (F.col("__t") + F.lit(vocab))
        )
        .cast(_DEC)
        .alias("ln_p"),
    )
    return like, priors


def nb_predict(
    test: DataFrame,
    like: DataFrame,
    priors: DataFrame,
    *,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score + argmax: returns (id, pred) — the predicted class per
    test document. A document that tokenizes to ZERO tokens (empty or
    all-punctuation text) still gets a row: with no token terms every
    class score reduces to ln_prior, so the prior-only argmax (the
    same min-struct tie-break) is its prediction — computed once from
    the tiny priors frame and broadcast-coalesced in."""
    toks = _tokens(test, id_col, text_col)
    # every (token occurrence) × (class): cross with the tiny class
    # frame, then left-join seen likelihoods; OOV/unseen -> 1/(T+V)
    pc = priors.select(label_col, "t_class", "v", "ln_prior")
    expanded = toks.join(F.broadcast(pc), how="cross")
    unseen = F.log(
        F.lit(1.0) / (F.col("t_class") + F.col("v")).cast("double")
    ).cast(_DEC)
    scored = expanded.join(like, [label_col, "__tok"], "left").withColumn(
        "__lp", F.coalesce(F.col("ln_p"), unseen)
    )
    per_class = scored.groupBy(id_col, label_col).agg(
        (F.first("ln_prior") + F.sum("__lp")).alias("__score")
    )
    # argmax, ties to smallest label: min over (-score, label)
    preds = (
        per_class.groupBy(id_col)
        .agg(F.min(F.struct((-F.col("__score")).alias("ns"), F.col(label_col).alias("l"))).alias("__m"))
        .select(id_col, F.col("__m.l").alias("pred"))
    )
    # zero-token documents never enter `toks`: left-join the full test
    # id set and fall back to the prior-only argmax (1-row frame)
    prior_pred = priors.groupBy().agg(
        F.min(
            F.struct((-F.col("ln_prior")).alias("ns"), F.col(label_col).alias("l"))
        )["l"].alias("__prior_pred")
    )
    return (
        test.select(id_col)
        .join(preds, id_col, "left")
        .crossJoin(F.broadcast(prior_pred))
        .select(id_col, F.coalesce("pred", "__prior_pred").alias("pred"))
    )
