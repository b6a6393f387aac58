"""The historical-trips ETL, single-engine (SURVEY.md §3.1).

Reference wiring (3 Airflow tasks, 2 engines, CSV interchange —
dags/etl_spark_historical.py:359-363):

    ensure_objects → extract_transform_with_pyspark → load_cleaned_to_snowflake

New-engine equivalent — ONE lazy Spark plan from landing zone to fact
table, no CSV hop, no Py4J↔warehouse split, Catalyst the only IR:

    discover latest month (S2)           sources/discovery.py
    → scan parquet (S1)
    → clean contract P1-P4 (+O1 knob)    operators/cleaning.py
    → anti-join merge on key6 (J1)       operators/merge.py
    → managed fact table + load_ts (S10) sources/warehouse.py
    → audit count (A2)

Differences from the reference, by design (SURVEY.md §4):
- no ``coalesce(1)``/CSV staging: the fact table is parquet, written
  at full parallelism;
- no double execution of the plan (the reference re-ran the whole
  read for count-then-write): the merge path counts once post-write;
- the 200k cap is a test knob, default off.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from ..operators.cleaning import clean_trips
from ..operators.merge import TRIP_MERGE_KEY
from ..sources.discovery import read_latest_month
from ..sources.warehouse import Warehouse


@dataclass
class EtlResult:
    month: str
    rows_cleaned: int
    rows_inserted: int
    fact_count: int
    first_pickup: object | None = None
    last_pickup: object | None = None


FACT_TABLE = "nyc_taxi_trips"


def run_trips_etl(
    spark: SparkSession,
    *,
    landing_root: str,
    warehouse_root: str,
    year: int,
    newest_month: int,
    cap: int | None = None,
) -> EtlResult:
    """One scheduled run: probe → clean → idempotent merge → audit.

    Re-running with the same month is a no-op on the fact table (the
    reference's MERGE invariant, readme.md:30) — except under ``cap``,
    which samples an arbitrary row subset per run exactly like the
    reference's bare ``limit(200_000)`` (etl_spark_historical.py:195):
    a re-run may sample different rows and insert them. That quirk is
    inherited deliberately; leave ``cap=None`` for exact idempotency."""
    found = read_latest_month(spark, landing_root, year=year, newest_month=newest_month)
    if found is None:
        raise FileNotFoundError(f"no landing partition available for {year}")
    month, raw = found

    cleaned = clean_trips(raw, cap=cap)
    if cap is not None:
        # limit(cap) picks an arbitrary row subset per execution; pin
        # one materialization so count and merge see the SAME sample
        # (and re-runs stay idempotent within a batch)
        cleaned = cleaned.localCheckpoint()

    wh = Warehouse(spark, warehouse_root)
    wh.ensure(FACT_TABLE, cleaned)

    # Audit metrics ride the merge's own write action via df.observe —
    # the reference re-executed its whole read for count-then-write
    # (etl_spark_historical.py:197-207); here the plan runs ONCE.
    # Attached after ensure(): ensure's empty-frame write must not be
    # the observation's first (0-row) execution.
    obs = Observation()
    observed = cleaned.observe(
        obs,
        F.count(F.lit(1)).alias("rows_cleaned"),
        F.min("pickup_datetime").alias("first_pickup"),
        F.max("pickup_datetime").alias("last_pickup"),
    )
    inserted = wh.merge_load(FACT_TABLE, observed, list(TRIP_MERGE_KEY), load_ts=True)
    audit = obs.get
    fact_count = wh.read(FACT_TABLE).count()
    return EtlResult(
        month,
        audit["rows_cleaned"],
        inserted,
        fact_count,
        first_pickup=audit["first_pickup"],
        last_pickup=audit["last_pickup"],
    )


def verification_queries(spark: SparkSession, warehouse_root: str) -> dict[str, DataFrame]:
    """§3.3's ad-hoc validation set against the fact table — the
    reference's manual Snowflake worksheet queries (readme.md:139-190)
    as spark.sql over the managed table."""
    from pyspark.sql import functions as F

    fact = Warehouse(spark, warehouse_root).read(FACT_TABLE)
    fact.createOrReplaceTempView("nyc_taxi_trips")
    return {
        "count": spark.sql("SELECT COUNT(*) AS cnt FROM nyc_taxi_trips"),
        "sample": spark.sql("SELECT * FROM nyc_taxi_trips LIMIT 20"),
        "date_range": spark.sql(
            "SELECT MIN(pickup_datetime) AS first_pickup, MAX(pickup_datetime) AS last_pickup "
            "FROM nyc_taxi_trips"
        ),
        "latest_loads": fact.orderBy(F.desc("load_ts")).limit(10),
    }
