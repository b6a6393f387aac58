"""Latest-partition discovery + landing-zone scan (SURVEY.md §2.1
S1-S3).

The reference probes TLC monthly parquet URLs newest→oldest with HTTP
HEAD and streams the first hit to /tmp
(reference: dags/etl_spark_historical.py:114-166). In-engine the same
capability splits into:

- ``latest_partition``: pick the newest available month partition
  from a listing (filesystem or URL prober — injectable for tests;
  network access is deliberately not exercised in this container).
- ``read_latest_month``: scan exactly that partition. On a real
  deployment the landing zone is a date-partitioned parquet layout
  (``landing/trip_month=YYYY-MM/``) and this becomes partition-pruned
  ``spark.read.parquet(root).where(trip_month = ...)`` — the probe
  loop disappears into the catalog.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession


def month_candidates(year: int, newest_month: int) -> list[str]:
    """Newest→oldest "YYYY-MM" strings for one year
    (etl_spark_historical.py:119-124 ordering)."""
    return [f"{year:04d}-{m:02d}" for m in range(newest_month, 0, -1)]


def latest_partition(
    candidates: Iterable[str], exists: Callable[[str], bool]
) -> str | None:
    """First candidate that exists (the reference's HEAD-probe loop,
    etl_spark_historical.py:119-143, with the prober injected)."""
    for c in candidates:
        if exists(c):
            return c
    return None


def fs_prober(root: str, template: str = "yellow_tripdata_{month}.parquet") -> Callable[[str], bool]:
    return lambda month: os.path.exists(os.path.join(root, template.format(month=month)))


def http_prober(url_template: str, timeout_s: int = 15) -> Callable[[str], bool]:
    """HEAD-probe factory (requests is gated: not exercised in tests)."""

    def probe(month: str) -> bool:  # pragma: no cover - needs network
        import requests

        r = requests.head(url_template.format(month=month), timeout=timeout_s)
        return r.status_code == 200

    return probe


def read_latest_month(
    spark: SparkSession,
    root: str,
    *,
    year: int,
    newest_month: int,
    template: str = "yellow_tripdata_{month}.parquet",
) -> tuple[str, DataFrame] | None:
    month = latest_partition(month_candidates(year, newest_month), fs_prober(root, template))
    if month is None:
        return None
    path = os.path.join(root, template.format(month=month))
    return month, spark.read.parquet(path)
