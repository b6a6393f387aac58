"""Explicit schema contracts.

The reference declares fixed warehouse schemas as DDL strings
(reference: dags/etl_spark_historical.py:50-73 fact + staging;
dags/weather_realtime_etl.py:52-64 weather). Spark tables have no
column defaults, so the ``load_ts DEFAULT CURRENT_TIMESTAMP()``
column (etl_spark_historical.py:59) becomes an ingest-time
``withColumn`` applied by every sink (see operators/merge.py and
streaming/weather.py).

Two schema regimes, mirroring SURVEY.md §1.3:
- *inferred* on scan (Parquet metadata), then
- *contracted* by an explicit select/cast (operators/cleaning.py),
  validated against these StructTypes before any sink.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Post-cleaning trip contract = reference fact-table DDL
# (etl_spark_historical.py:50-61) minus the warehouse-side default column.
TRIPS_CLEAN = T.StructType(
    [
        T.StructField("pickup_datetime", T.TimestampType(), False),
        T.StructField("dropoff_datetime", T.TimestampType(), False),
        T.StructField("pickup_zone_id", T.IntegerType(), False),
        T.StructField("dropoff_zone_id", T.IntegerType(), False),
        T.StructField("passenger_count", T.IntegerType(), True),
        T.StructField("trip_distance", T.DoubleType(), True),
        T.StructField("total_amount", T.DoubleType(), True),
    ]
)

# Audit column appended at every ingest path (etl_spark_historical.py:59).
LOAD_TS_COL = "load_ts"

# Weather observation contract (weather_realtime_etl.py:52-64): typed
# scalars + the raw JSON payload kept verbatim (VARIANT equivalent —
# raw string + typed extraction on read, SURVEY.md §1.2).
WEATHER = T.StructType(
    [
        T.StructField("observed_at", T.TimestampType(), False),
        T.StructField("city", T.StringType(), True),
        T.StructField("temp_f", T.DoubleType(), True),
        T.StructField("weather_desc", T.StringType(), True),
        T.StructField("humidity_pct", T.IntegerType(), True),
        T.StructField("raw_json", T.StringType(), True),
    ]
)

# Typed view of the OpenWeather payload fields the reference extracts
# (weather_realtime_etl.py:117-121) — used by functions/json.py.
OPENWEATHER_PAYLOAD = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField(
            "main",
            T.StructType(
                [
                    T.StructField("temp", T.DoubleType(), True),
                    T.StructField("humidity", T.IntegerType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "weather",
            T.ArrayType(
                T.StructType([T.StructField("description", T.StringType(), True)])
            ),
            True,
        ),
    ]
)

# Multimodal column contract (SURVEY.md §2.10 M6): opaque binary payload
# + typed metadata struct. Decode stages are Pandas-UDF plumbing over
# this shape (operators/multimodal.py).
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def conforms(df_schema: T.StructType, contract: T.StructType) -> list[str]:
    """Return a list of human-readable violations of ``contract`` in
    ``df_schema`` (empty list = conforms). Nullability is advisory:
    Spark readers mark everything nullable, so only name/type are hard."""
    errs = []
    have = {f.name: f.dataType for f in df_schema.fields}
    for f in contract.fields:
        if f.name not in have:
            errs.append(f"missing column {f.name}")
        # simpleString: structural type equality, nullability-insensitive
        elif have[f.name].simpleString() != f.dataType.simpleString():
            errs.append(f"column {f.name}: {have[f.name]} != {f.dataType}")
    return errs
