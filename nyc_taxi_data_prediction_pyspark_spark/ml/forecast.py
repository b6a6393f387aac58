"""Demand forecasting pipeline (SURVEY.md §2.10 M1).

The reference's north star is "simple forecasting" over demand/delay
by weather (reference: readme.md:10, :137) — no model code exists in
the repo, so the design is the declared capability done MLlib-native:

  hourly demand table (operators/aggregates.hourly_demand shape)
    → calendar features (hour-of-day, day-of-week — F.hour/F.dayofweek)
    → StringIndexer(event_type) + OneHotEncoder
    → VectorAssembler → LinearRegression (seeded, deterministic)

Everything is a standard MLlib Pipeline: fits distribute via
treeAggregate, transforms are narrow — nothing custom needed at scale.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.sql import DataFrame, functions as F


def demand_training_frame(events: DataFrame) -> DataFrame:
    """Per (hour-bucket, type) counts + calendar features — the
    trips⋈weather-era training table shape."""
    return (
        events.withColumn("hour_bucket", F.date_trunc("hour", F.col("ts")))
        .groupBy("hour_bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("demand"))
        .withColumn("hour_of_day", F.hour("hour_bucket").cast("double"))
        .withColumn("day_of_week", F.dayofweek("hour_bucket").cast("double"))
    )


def build_pipeline() -> Pipeline:
    from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
    from pyspark.ml.regression import LinearRegression

    idx = StringIndexer(inputCol="event_type", outputCol="type_idx", stringOrderType="alphabetAsc")
    ohe = OneHotEncoder(inputCols=["type_idx"], outputCols=["type_vec"])
    feats = VectorAssembler(
        inputCols=["hour_of_day", "day_of_week", "type_vec"], outputCol="features"
    )
    lr = LinearRegression(featuresCol="features", labelCol="demand", regParam=0.1)
    return Pipeline(stages=[idx, ohe, feats, lr])


def fit_demand_model(events: DataFrame) -> PipelineModel:
    return build_pipeline().fit(demand_training_frame(events))


def predict_demand(events: DataFrame, model: PipelineModel | None = None) -> DataFrame:
    """Train/score on the events fixture; returns (hour_bucket,
    event_type, demand, prediction). Deterministic given fixed input
    (LinearRegression normal-equations solver on a tiny design
    matrix), but float-sensitive → rows-only correctness check."""
    frame = demand_training_frame(events)
    m = model or build_pipeline().fit(frame)
    return m.transform(frame).select(
        "hour_bucket", "event_type", "demand", F.round("prediction", 4).alias("prediction")
    )


def fit_quality_report(events: DataFrame) -> DataFrame:
    """Deterministic ACCEPTANCE AUDIT for the MLlib demand fit (round-6
    verdict ask: make the JVM-seeded q29 driver-checkable). The fitted
    coefficients live inside the library and can never hash-match an
    external engine — but the fit's CONTRACT can, with bit-stable
    outputs:

    - exact columns any engine reproduces: n_rows (training rows =
      distinct hour×type cells), n_types, sum/min/max demand;
    - ``preds_complete``: every training row got a finite prediction;
    - ``fit_not_worse_than_constant``: training R² > -0.01. For ridge
      with an unpenalized intercept this is a theorem (the solver's
      objective at b=0, a=ȳ is SS_tot, so SS_res <= SS_tot => R² >= 0);
      the -0.01 slack absorbs float summation only. A solver
      regression (diverging/garbage fit) flips the boolean and fails
      the oracle value-hash.

    SS terms are plain double sums — order-dependent floats, but they
    feed only a boolean with enormous margin, never the hash."""
    frame = demand_training_frame(events)
    scored = build_pipeline().fit(frame).transform(frame)
    pred_ok = (
        F.col("prediction").isNotNull()
        & ~F.isnan("prediction")
        & (F.abs("prediction") < F.lit(1e15))
    )
    r = scored.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_type").alias("n_types"),
        F.sum("demand").cast("bigint").alias("sum_demand"),
        F.min("demand").cast("bigint").alias("min_demand"),
        F.max("demand").cast("bigint").alias("max_demand"),
        F.sum(pred_ok.cast("bigint")).alias("__n_pred_ok"),
        F.sum(F.col("demand").cast("double")).alias("__sd"),
        F.sum((F.col("demand") * F.col("demand")).cast("double")).alias("__sdd"),
        F.sum(
            (F.col("demand") - F.col("prediction")) * (F.col("demand") - F.col("prediction"))
        ).alias("__ssres"),
    )
    sstot = F.col("__sdd") - F.col("__sd") * F.col("__sd") / F.col("n_rows")
    return r.select(
        "n_rows",
        "n_types",
        "sum_demand",
        "min_demand",
        "max_demand",
        (F.col("__n_pred_ok") == F.col("n_rows")).alias("preds_complete"),
        (F.lit(1.0) - F.col("__ssres") / sstot > F.lit(-0.01)).alias(
            "fit_not_worse_than_constant"
        ),
    )


def grouped_linear_fit(
    df: DataFrame, *, group: str, x: str, y: str
) -> DataFrame:
    """Per-group simple linear regression (y ~ x), closed form from
    sufficient statistics: one map-side-combined groupBy computes
    (n, Σx, Σx², Σy, Σxy) and the slope/intercept are pure arithmetic
    on those five numbers — no iterative solver, one shuffle, scales
    to any group count.

    Σx/Σx² are exact integers, Σy/Σxy go through decimal so the sums
    are order-independent (aggregates.dsum rationale) → the resulting
    doubles are engine-stable and the whole fit oracle-checks.
    """
    xc = F.col(x).cast("long")
    stats = df.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xc).alias("sx"),
        F.sum(xc * xc).alias("sxx"),
        F.sum(F.col(y).cast("decimal(18,4)")).cast("double").alias("sy"),
        F.sum((xc * F.col(y)).cast("decimal(28,8)")).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return stats.select(
        group,
        F.col("n").alias("n_obs"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    )


def grouped_linear_fit2(
    df: DataFrame, *, group: str, x1: str, x2: str, y: str
) -> DataFrame:
    """Per-group TWO-feature OLS (y ~ b0 + b1·x1 + b2·x2), closed form
    — the multiple-regression step up from ``grouped_linear_fit``'s
    single feature, still one shuffle and zero iterative solving: the
    normal-equation system A·β = b (A the symmetric 3×3 raw-moment
    matrix) is solved by CRAMER'S RULE on exact sufficient statistics.

    Exactness discipline (the spearman/kendall rank-product lesson):
    x1/x2 are INTEGER features, so the six A-entries (n, Σx1, Σx2,
    Σx1², Σx1x2, Σx2²) are exact BIGINTs; every cofactor is a
    difference of two products whose FACTORS are cast to
    DECIMAL(19,0) before multiplying (2-product terms stay well inside
    DECIMAL(38,0) — exact for per-group n up to ~1e9 with day/hour-
    class features, documented bound). The y-moments (Σy, Σx1y, Σx2y,
    Σy²) are decimal-quantized sums (order-independent across any
    partitioning — the dsum rationale). Only the final 3-term Cramer
    expansions and divisions run in IEEE doubles, each with ONE fixed
    parenthesization, so both engines round identically and the fit
    value-hash checks.

    Degenerate groups (collinear features, n too small → det = 0)
    yield NULL coefficients, not an error; zero-variance y yields
    NULL r2.

    Scale: one map-side-combined groupBy computing 10 statistics —
    the same cost class as any grouped agg; no matrix library, no
    per-group collect, no UDF. Returns (group, n_obs, b0, b1, b2,
    r2), coefficients rounded 6.
    """
    x1c = F.col(x1).cast("long")
    x2c = F.col(x2).cast("long")
    yv = F.col(y).cast("double")
    stats = df.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1c).alias("sa"),
        F.sum(x2c).alias("sb"),
        F.sum(x1c * x1c).alias("sc"),
        F.sum(x1c * x2c).alias("sd"),
        F.sum(x2c * x2c).alias("se"),
        F.sum(yv.cast("decimal(18,4)")).cast("double").alias("sy"),
        F.sum((x1c * yv).cast("decimal(28,8)")).cast("double").alias("s1y"),
        F.sum((x2c * yv).cast("decimal(28,8)")).cast("double").alias("s2y"),
        F.sum((yv * yv).cast("decimal(28,8)")).cast("double").alias("syy"),
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    dbl = lambda c: c.cast("double")  # noqa: E731
    # signed cofactors of the symmetric moment matrix
    # A = [[n, a, b], [a, c, d], [b, d, e]] — exact decimal arithmetic
    c00 = d19("sc") * d19("se") - d19("sd") * d19("sd")
    c10 = d19("sb") * d19("sd") - d19("sa") * d19("se")  # = C01 (symmetry)
    c20 = d19("sa") * d19("sd") - d19("sb") * d19("sc")  # = C02
    c11 = d19("n") * d19("se") - d19("sb") * d19("sb")
    c21 = d19("sa") * d19("sb") - d19("n") * d19("sd")   # = C12
    c22 = d19("n") * d19("sc") - d19("sa") * d19("sa")
    dn = F.col("n").cast("double")
    m = stats.select(
        group,
        "n",
        F.col("sa").cast("double").alias("da"),
        F.col("sb").cast("double").alias("db"),
        "sy",
        "s1y",
        "s2y",
        "syy",
        dbl(c00).alias("c00"),
        dbl(c10).alias("c10"),
        dbl(c20).alias("c20"),
        dbl(c11).alias("c11"),
        dbl(c21).alias("c21"),
        dbl(c22).alias("c22"),
    )
    det = (dn * F.col("c00") + F.col("da") * F.col("c10")) + F.col("db") * F.col(
        "c20"
    )
    det0 = (F.col("sy") * F.col("c00") + F.col("s1y") * F.col("c10")) + F.col(
        "s2y"
    ) * F.col("c20")
    det1 = (F.col("sy") * F.col("c10") + F.col("s1y") * F.col("c11")) + F.col(
        "s2y"
    ) * F.col("c21")
    det2 = (F.col("sy") * F.col("c20") + F.col("s1y") * F.col("c21")) + F.col(
        "s2y"
    ) * F.col("c22")
    b0 = det0 / det
    b1 = det1 / det
    b2 = det2 / det
    sse = F.col("syy") - (
        (b0 * F.col("sy") + b1 * F.col("s1y")) + b2 * F.col("s2y")
    )
    sst = F.col("syy") - F.col("sy") * F.col("sy") / dn
    return m.select(
        group,
        F.col("n").alias("n_obs"),
        F.when(det != 0, F.round(b0, 6)).alias("b0"),
        F.when(det != 0, F.round(b1, 6)).alias("b1"),
        F.when(det != 0, F.round(b2, 6)).alias("b2"),
        F.when((det != 0) & (sst > 0), F.round(F.lit(1.0) - sse / sst, 6)).alias(
            "r2"
        ),
    ).orderBy(group)


def grouped_linear_fit_pandas(
    df: DataFrame, *, group: str, x: str, y: str
) -> DataFrame:
    """Same fit via a grouped-map Pandas UDF (applyInPandas + numpy
    lstsq) — the shape every custom per-group Python model takes:
    Arrow-batched, one group per call, schema declared up front.
    Float partial order differs from the closed form, so this variant
    is contract-tested against grouped_linear_fit (rtol) rather than
    oracle-hashed."""
    import pandas as pd

    out_schema = f"{group} string, n_obs long, slope double, intercept double"

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        xs = pdf[x].to_numpy(dtype="float64")
        ys = pdf[y].to_numpy(dtype="float64")
        a = np.vstack([xs, np.ones_like(xs)]).T
        (m, b), *_ = np.linalg.lstsq(a, ys, rcond=None)
        return pd.DataFrame(
            {group: [pdf[group].iloc[0]], "n_obs": [len(pdf)], "slope": [m], "intercept": [b]}
        )

    return df.select(group, x, y).groupBy(group).applyInPandas(fit, out_schema)


def conformal_interval_backtest(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    lag_hours: int = 168,
    alpha_pct: int = 10,
    cal_frac_pct: int = 60,
) -> DataFrame:
    """Split conformal prediction intervals for the seasonal-naive
    hourly forecaster (Vovk et al.; the split-conformal recipe of Lei
    et al. JASA 2018): per event type, forecast each hour's count with
    the same hour ``lag_hours`` earlier on the zero-filled hour spine
    (the q181 base forecaster), take the FIRST ``cal_frac_pct``% of
    forecastable hours as the calibration window and the rest as test,
    set the interval half-width to the ⌈(n_cal+1)·(1−α)⌉-th smallest
    absolute calibration residual (the finite-sample-valid split-
    conformal quantile — an exact ORDER STATISTIC at an integer rank,
    not an interpolated quantile), and report empirical test coverage
    of pred ± q̂.

    Exactness: counts and residuals are BIGINTs, the calibration rank
    is integer ceiling arithmetic ((n+1)·(100−α)+99) div 100, q̂ is a
    selected residual (no interpolation), coverage is one IEEE
    division — everything replays in SQL. When the rank exceeds n_cal
    (tiny calibration sets) q̂ is the max residual and the row flags
    ``qhat_clamped`` (the standard +∞ case, made finite and visible).

    Scale shape: the spine/lag/rank windows all partition by event
    type over the HOUR DOMAIN — bounded by the observation window,
    metadata-sized, never event-sized; the raw events are touched by
    exactly one combinable groupBy.

    Returns per type: (event_type, n_cal, n_test, qhat, qhat_clamped,
    n_covered, coverage).
    """
    from pyspark.sql import Window as W

    hours = events.groupBy(
        type_col, F.date_trunc("hour", ts_col).alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    bounds = events.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    ).crossJoin(events.select(type_col).distinct())
    w = W.partitionBy(type_col).orderBy("hidx")
    scored = (
        spine.join(hours, [type_col, "h"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0).cast("bigint")))
        .withColumn("hidx", F.expr("unix_micros(h) div 3600000000"))
        .withColumn("pred", F.lag("c", lag_hours).over(w))
        .where(F.col("pred").isNotNull())
        .withColumn("resid", F.abs(F.col("c") - F.col("pred")))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy(type_col)))
    )
    split = scored.withColumn(
        "is_cal", F.col("rn") <= F.expr(f"(n * {int(cal_frac_pct)}) div 100")
    )
    cal = split.where("is_cal")
    ncal = cal.groupBy(type_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal")
    )
    qrank = F.expr(f"((n_cal + 1) * {100 - int(alpha_pct)} + 99) div 100")
    ranked = cal.join(ncal, type_col).withColumn(
        "rrank",
        F.row_number().over(
            W.partitionBy(type_col).orderBy(F.col("resid").asc(), F.col("hidx").asc())
        ),
    )
    qhat = (
        ranked.withColumn("qr", qrank)
        .withColumn("clamped", F.col("qr") > F.col("n_cal"))
        .where(
            (F.col("rrank") == F.least(F.col("qr"), F.col("n_cal")))
        )
        .select(
            type_col,
            "n_cal",
            F.col("resid").alias("qhat"),
            F.col("clamped").alias("qhat_clamped"),
        )
    )
    test = split.where(~F.col("is_cal"))
    return (
        test.join(qhat, type_col)
        .groupBy(type_col, "n_cal", "qhat", "qhat_clamped")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum((F.col("resid") <= F.col("qhat")).cast("bigint")).alias("n_covered"),
        )
        .select(
            type_col,
            "n_cal",
            "n_test",
            "qhat",
            "qhat_clamped",
            "n_covered",
            (F.col("n_covered").cast("double") / F.col("n_test")).alias("coverage"),
        )
        .orderBy(type_col)
    )
