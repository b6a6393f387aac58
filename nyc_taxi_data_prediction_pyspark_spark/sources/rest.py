"""REST JSON API source (SURVEY.md §2.1 S4, S9).

The reference fetches OpenWeather JSON in the task process and inserts
one typed row per run (reference: dags/weather_realtime_etl.py:99-157).
Spark-native: fetch driver-side (the payload is one document — there
is nothing to distribute), build a single-row DataFrame under the
WEATHER contract, append. The fetch callable is injected so tests use
a canned payload (no network in this container); a real deployment
passes a requests-backed fetcher.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.json import extract_weather_fields
from ..schemas import WEATHER


def fetch_openweather(api_key: str, city: str, timeout_s: int = 30) -> dict:  # pragma: no cover
    """Real fetcher (weather_realtime_etl.py:99-110 parity): gated
    behind import-try, never called in tests."""
    import requests

    r = requests.get(
        "https://api.openweathermap.org/data/2.5/weather",
        params={"q": city, "appid": api_key, "units": "imperial"},
        timeout=timeout_s,
    )
    r.raise_for_status()
    return r.json()


def weather_observation(
    spark: SparkSession,
    *,
    fetch: Callable[[], dict],
    default_city: str = "New York",
) -> DataFrame:
    """One observation row: raw payload kept verbatim (VARIANT
    pattern), typed fields extracted engine-side via from_json — NOT
    driver-side Python parsing (the reference's F2 is re-expressed as
    built-ins, SURVEY.md §2.10)."""
    payload = fetch()
    raw = json.dumps(payload)
    base = spark.createDataFrame([(raw,)], "raw_json string").withColumn(
        "observed_at", F.current_timestamp()
    )
    typed = extract_weather_fields(base)
    typed = typed.withColumn("city", F.coalesce(F.col("city"), F.lit(default_city)))
    return typed.select([f.name for f in WEATHER.fields])
