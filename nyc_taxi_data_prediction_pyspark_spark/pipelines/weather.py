"""The near-real-time weather feed, single-engine (SURVEY.md §3.2).

Reference wiring (dags/weather_realtime_etl.py:175-178): hourly DAG →
REST fetch → driver-side JSON parse → parameterized warehouse INSERT.

New-engine equivalent: fetch driver-side (one document per interval —
nothing to distribute), typed extraction engine-side via from_json
(sources/rest.py), append to a managed table with the load_ts audit
column. ``run_weather_feed`` is one scheduled tick; the enrichment
join (J2) then consumes the table via hour-bucket or as-of join
(operators/joins.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.rest import weather_observation
from ..sources.warehouse import Warehouse

WEATHER_TABLE = "raw_weather"


def run_weather_feed(
    spark: SparkSession,
    *,
    warehouse_root: str,
    fetch: Callable[[], dict],
    default_city: str = "New York",
) -> int:
    """One hourly tick: fetch → typed row → append. Returns the table
    row count after the append (the reference's per-run validation:
    'one new row each time the DAG runs', readme.md:112)."""
    obs = weather_observation(spark, fetch=fetch, default_city=default_city)
    wh = Warehouse(spark, warehouse_root)
    wh.ensure(WEATHER_TABLE, obs)
    wh.append(WEATHER_TABLE, obs, load_ts=True)
    return wh.read(WEATHER_TABLE).count()


def latest_observations(spark: SparkSession, warehouse_root: str, k: int = 10) -> DataFrame:
    """readme.md:178-187: ordered projection, newest first."""
    wh = Warehouse(spark, warehouse_root)
    return (
        wh.read(WEATHER_TABLE)
        .select("observed_at", "city", "temp_f", "weather_desc", "humidity_pct", "load_ts")
        .orderBy(F.desc("load_ts"))
        .limit(k)
    )
