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


NULL_LITERALS = ("", "NULL", "null")  # NULL_IF set, etl_spark_historical.py:81


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S6+S8: header skip, optional-quote, NULL literals → NULL, and
    abort-on-malformed (ON_ERROR='ABORT_STATEMENT' ≙ FAILFAST,
    etl_spark_historical.py:295).

    Spark's ``nullValue`` option takes ONE literal, but the reference's
    file format nullifies all of '', 'NULL', 'null' *before* type
    conversion. So: read everything as strings (FAILFAST still catches
    structural malformation), nullify the literal set, then cast —
    with a ``raise_error`` guard on any non-null cell the cast cannot
    convert, which is the lazy, executor-side form of ABORT_STATEMENT.
    """
    from pyspark.sql import functions as F

    str_schema = T.StructType([T.StructField(f.name, T.StringType(), True) for f in schema.fields])
    raw = (
        spark.read.schema(str_schema)
        .option("header", True)
        .option("quote", '"')
        .option("mode", "FAILFAST")
        .csv(path)
    )
    cols = []
    for f in schema.fields:
        s = F.col(f.name)
        nullified = F.when(s.isin(*NULL_LITERALS), F.lit(None)).otherwise(s)
        casted = nullified.cast(f.dataType)
        guarded = F.when(
            nullified.isNotNull() & casted.isNull(),
            F.raise_error(
                F.concat(
                    F.lit(f"read_csv abort: cannot cast column {f.name} value '"),
                    nullified,
                    F.lit(f"' to {f.dataType.simpleString()}"),
                )
            ).cast(f.dataType),
        ).otherwise(casted)
        cols.append(guarded.alias(f.name))
    return raw.select(*cols)
