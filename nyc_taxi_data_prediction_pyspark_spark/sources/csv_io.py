"""CSV interchange parity (SURVEY.md §2.1 S5-S6).

The reference round-trips Spark→CSV→warehouse with a specific file
format: header row, ``"`` quoting, empty/'NULL'/'null' → NULL
(reference: dags/etl_spark_historical.py:76-82 read side, :199-207
write side). The CSV hop itself is an artifact of the Snowflake PUT
path — parquet_io is the real interchange — but the options parity is
preserved for source compatibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_csv(df: DataFrame, path: str, *, single_file: bool = False) -> None:
    """S5. ``single_file`` reproduces the reference's coalesce(1)
    (etl_spark_historical.py:201) — document the parallelism loss; at
    scale leave False and let AQE size the output tasks."""
    out = df.coalesce(1) if single_file else df
    (out.write.mode("overwrite").option("header", True).option("quote", '"').csv(path))


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S6+S8: header skip, optional-quote, NULL literals → NULL, and
    abort-on-malformed (ON_ERROR='ABORT_STATEMENT' ≙ FAILFAST,
    etl_spark_historical.py:295)."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("quote", '"')
        .option("nullValue", "NULL")
        .option("emptyValue", None)
        .option("mode", "FAILFAST")
        .csv(path)
    )
