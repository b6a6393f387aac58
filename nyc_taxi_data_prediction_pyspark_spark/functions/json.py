"""JSON handling (SURVEY.md §2.7 F1-F3, F7).

The reference keeps the full OpenWeather payload as a VARIANT column
and extracts typed scalars driver-side in Python
(reference: dags/weather_realtime_etl.py:115-128, 140). Spark-native
equivalent: raw JSON string column + ``from_json`` typed extraction
(schema-on-read escape hatch, SURVEY.md §1.1), or path extraction via
``get_json_object`` when only a field or two is needed (cheaper: no
full struct materialization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..schemas import OPENWEATHER_PAYLOAD


def json_get(col: Column | str, path: str) -> Column:
    """F2: single-path extraction, e.g. json_get('raw_json', '$.main.temp')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def parse_typed(col: Column | str, schema: T.StructType) -> Column:
    """F1: string → typed struct (PARSE_JSON equivalent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


def parse_variant(col: Column | str) -> Column:
    """Spark 4 VariantType path (true VARIANT parity with the
    reference's Snowflake column, weather_realtime_etl.py:60): binary
    semi-structured encoding + path access via variant_get. Falls back
    to None-returning guard on pre-4.0 runtimes — callers keep the raw
    string + from_json path as the portable default."""
    c = F.col(col) if isinstance(col, str) else col
    if not hasattr(F, "parse_json"):  # pragma: no cover - Spark < 4
        raise NotImplementedError("VariantType requires Spark >= 4.0; use parse_typed")
    return F.parse_json(c)


def variant_get(col: Column | str, path: str, target_type: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.variant_get(c, path, target_type)


def to_json_string(*cols: str) -> Column:
    """F7: serialize columns back to a JSON payload (json.dumps parity,
    weather_realtime_etl.py:124)."""
    return F.to_json(F.struct(*cols))


def extract_weather_fields(df: DataFrame, raw_col: str = "raw_json") -> DataFrame:
    """The reference's exact field set (weather_realtime_etl.py:117-121),
    as one from_json pass: city (payload.name), temp_f, weather_desc
    (first array element), humidity_pct. Raw payload column is kept —
    the VARIANT-alongside-scalars pattern."""
    parsed = parse_typed(raw_col, OPENWEATHER_PAYLOAD)
    return (
        df.withColumn("__p", parsed)
        .withColumn("city", F.col("__p.name"))
        .withColumn("temp_f", F.col("__p.main.temp").cast("double"))
        .withColumn("weather_desc", F.col("__p.weather")[0]["description"])
        .withColumn("humidity_pct", F.col("__p.main.humidity").cast("int"))
        .drop("__p")
    )
