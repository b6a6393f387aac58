"""Warehouse-table lifecycle (SURVEY.md §2.1 S7-S12): managed parquet
tables replacing the Snowflake stage/PUT/COPY/MERGE/TRUNCATE cycle
(reference: dags/etl_spark_historical.py:251-339).

Design: a plain directory-of-parquet "warehouse" with idempotent DDL
(S10), staging-directory lifecycle (S11), atomic-enough swap writes,
and the merge-upsert load (J1) from operators/merge.py. Without a
transactional table format, atomicity is stage-directory + rename
(single-writer), which the docstrings call out explicitly
(SURVEY.md §7.4).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.merge import anti_new_rows
from ..schemas import LOAD_TS_COL


class Warehouse:
    """Minimal managed-table layout: <root>/<table>/ parquet dirs."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    # S10: CREATE TABLE IF NOT EXISTS — idempotent object creation.
    def ensure(self, table: str, empty_like: DataFrame, *, load_ts: bool = True) -> None:
        """``load_ts=True`` bakes the audit column into the empty
        table so every part file in the directory shares one schema —
        a 0-row file without it would race the audit-stamped appends
        for schema inference (single-footer inference picks whichever
        file sorts first)."""
        p = self.path(table)
        if not os.path.exists(p):
            empty = empty_like.limit(0)
            if load_ts and LOAD_TS_COL not in empty.columns:
                empty = empty.withColumn(LOAD_TS_COL, F.lit(None).cast("timestamp"))
            empty.write.mode("overwrite").parquet(p)

    def exists(self, table: str) -> bool:
        return os.path.exists(self.path(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    # S11: CREATE OR REPLACE STAGE — staging dir lifecycle.
    def stage_dir(self, name: str, *, replace: bool = True) -> str:
        p = os.path.join(self.root, "_stage", name)
        if replace and os.path.exists(p):
            shutil.rmtree(p)
        os.makedirs(p, exist_ok=True)
        return p

    # S12: TRUNCATE TABLE.
    def truncate(self, table: str) -> None:
        df = self.read(table).limit(0)
        self._swap_write(table, df)

    def append(
        self, table: str, df: DataFrame, *, load_ts: bool = True, partition_by: list[str] | None = None
    ) -> None:
        """S8/S9 append path; stamps the audit column every ingest
        (column defaults don't exist in Spark DDL — SURVEY.md §7.4).
        ``partition_by``: hive-layout partition columns — at 100 TB the
        fact table partitions by trip month so merge probes and time
        queries prune to a few directories."""
        out = df.withColumn(LOAD_TS_COL, F.current_timestamp()) if load_ts else df
        w = out.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def merge_load(self, table: str, stg: DataFrame, key: list[str], *, load_ts: bool = True) -> int:
        """J1 load: insert-if-not-matched on ``key``; returns rows
        inserted. Existing fact rows keep their original ``load_ts``
        (reference semantics: the audit default fires on INSERT only,
        etl_spark_historical.py:59) — only the new rows are stamped.
        Rewrites the table via stage+rename (the non-transactional
        MERGE caveat, single-writer assumption)."""
        fact = self.read(table)
        if load_ts and LOAD_TS_COL not in fact.columns:
            # freshly ensured table: audit column materializes on first load
            fact = fact.withColumn(LOAD_TS_COL, F.lit(None).cast("timestamp"))
        before = fact.count()
        new_rows = anti_new_rows(stg, fact.select(*key), key)
        if load_ts:
            new_rows = new_rows.withColumn(LOAD_TS_COL, F.current_timestamp())
        merged = fact.unionByName(new_rows)
        self._swap_write(table, merged)
        return self.read(table).count() - before

    def save_bucketed(
        self, table: str, df: DataFrame, *, buckets: int, key: list[str]
    ) -> None:
        """Bucketed managed table (saveAsTable — bucketing metadata
        needs the session catalog, not a bare parquet dir): joins and
        aggregations on ``key`` between co-bucketed tables skip the
        shuffle entirely. At 100 TB, bucket the fact table on the merge
        key prefix so every load's anti-join is exchange-free."""
        (
            df.write.mode("overwrite")
            .bucketBy(buckets, *key)
            .sortBy(*key)
            .option("path", self.path(f"bucketed_{table}"))
            .saveAsTable(table)
        )

    def compact(
        self, table: str, *, target_files: int, sort_by: list[str] | None = None
    ) -> int:
        """Small-file compaction: rewrite the table as ``target_files``
        parquet files, optionally sorted within each file.

        Continuous micro-batch appends (the weather feed's
        one-row-per-run cadence, or per-month merge loads) accumulate
        tiny files; at scale that throttles every subsequent scan on
        open/seek cost and starves the scheduler with million-split
        stages. Compaction is the standing maintenance op every table
        format runs (Delta OPTIMIZE, Iceberg rewrite_data_files) —
        here it is repartition + atomic stage-and-rename swap.

        ``sort_by`` gives each file a tight min/max envelope on those
        columns, so parquet row-group statistics prune reads for
        range predicates (the poor-man's Z-order; one clustering key
        is usually enough). Returns the resulting file count.
        """
        df = self.read(table)
        out = df.repartition(target_files)
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)
        self._swap_write(table, out)
        import glob as _glob

        return len(_glob.glob(os.path.join(self.path(table), "part-*")))

    def _swap_write(self, table: str, df: DataFrame) -> None:
        tmp = self.path(f"_tmp_{table}_{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(tmp)
        final = self.path(table)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
