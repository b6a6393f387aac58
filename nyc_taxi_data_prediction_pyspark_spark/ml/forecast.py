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
