"""Physical-layout advisors (100 TB posture, the q106/q231 family):
what would this table's file layout do to a real predicate, and how
should its small files be compacted — the two questions an OPTIMIZE /
maintenance scheduler answers before touching 100 TB of parquet
(reference parity anchor: the reference stages and bulk-loads into a
warehouse whose pruning and file sizing it never audits —
etl_spark_historical.py:210-230's blind COPY INTO; these operators are
that audit).

Everything is exact integer/bool algebra plus one or two final IEEE
divisions, so the DuckDB oracle value-hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def zone_map_skip_audit(
    df: DataFrame,
    *,
    order_col: str,
    predicate_col: str,
    lo,
    hi,
    bucket_rows: int,
) -> DataFrame:
    """Zone-map (min/max row-group statistics) skipping audit: lay the
    table out in ``order_col`` order, cut it into files of
    ``bucket_rows`` rows, record each file's (min, max) of
    ``predicate_col``, and measure how much of the table the band
    predicate ``lo <= predicate_col <= hi`` could SKIP — the
    data-skipping readout behind every "should we sort by this
    column" layout decision (the q106 z-order audit asks about
    locality of a chosen key; this asks about PRUNING for a concrete
    predicate under the natural/physical order).

    A file is skippable iff its zone [min, max] misses [lo, hi]
    entirely — exactly parquet row-group pruning semantics. Buckets
    are defined arithmetically (bucket = floor(rank/bucket_rows) over
    a dense ``order_col`` rank) so both engines cut identical files;
    the rank uses the two-phase grouped machinery's contract (dense
    integer division of a globally-orderable key, not a physical
    row order that differs per engine).

    Returns ONE row: (n_files, n_skipped, rows_total, rows_scanned,
    rows_matching, skip_ratio, scan_amplification) where
    scan_amplification = rows_scanned / rows_matching (1.0 = perfect
    layout; the IEEE divisions are the only non-integer steps)."""
    # dense arithmetic bucketing on the ORDER key itself: files are
    # contiguous key ranges, the layout a sort-by-order_col produces
    keyed = df.select(
        F.col(order_col).alias("__k"), F.col(predicate_col).alias("__p")
    )
    # rank via distinct-key frame: exact, engine-independent
    from .windows import grouped_cumsum_two_phase

    per_key = keyed.groupBy("__k").agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    ranked = grouped_cumsum_two_phase(
        per_key, [], ["__k"], ["__c"], exclusive=True
    ).select("__k", F.col("__cum___c").alias("__start"))
    zones = (
        keyed.join(ranked, "__k")
        .withColumn(
            # exact bigint floor-division (``div``), NOT double ``/``:
            # double rounding diverges from integer division once
            # cumulative row starts exceed 2^53, and the DuckDB oracle
            # uses exact integer ``//`` — both engines must cut the
            # identical file id at any scale (__start >= 0, so div ==
            # floor division)
            "__file",
            F.expr(f"__start div {int(bucket_rows)}").cast("bigint"),
        )
        .groupBy("__file")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__rows"),
            F.min("__p").alias("__zmin"),
            F.max("__p").alias("__zmax"),
            F.sum(
                F.when(
                    (F.col("__p") >= F.lit(lo)) & (F.col("__p") <= F.lit(hi)), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("__match"),
        )
        .withColumn(
            "__skip",
            (F.col("__zmax") < F.lit(lo)) | (F.col("__zmin") > F.lit(hi)),
        )
    )
    return zones.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(F.when(F.col("__skip"), 1).otherwise(0)).cast("bigint").alias("n_skipped"),
        F.sum("__rows").cast("bigint").alias("rows_total"),
        F.sum(F.when(~F.col("__skip"), F.col("__rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_scanned"),
        F.sum("__match").cast("bigint").alias("rows_matching"),
    ).select(
        "n_files",
        "n_skipped",
        "rows_total",
        "rows_scanned",
        "rows_matching",
        (F.col("n_skipped").cast("double") / F.col("n_files").cast("double")).alias(
            "skip_ratio"
        ),
        F.when(
            F.col("rows_matching") > 0,
            F.col("rows_scanned").cast("double") / F.col("rows_matching").cast("double"),
        ).alias("scan_amplification"),
    )


def compaction_plan_next_fit(
    files: DataFrame,
    *,
    partition_col: str,
    size_col: str,
    id_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction planner, next-fit-decreasing: within each
    partition, walk the files in (size DESC, id ASC) order and start a
    new output bin whenever the current one would overflow
    ``target_bytes`` — the maintenance pass that turns a
    streaming-ingested thousand-file partition back into
    near-target-size objects (Warehouse.compact's sizing step,
    planned before any data moves).

    Next-fit-decreasing is the deliberately chosen variant: its fold
    state is TWO integers (bins so far, current bin load), so the
    whole plan is one in-row F.aggregate over the partition's sorted
    file array — deterministic, oracle-replayable as a recursive CTE
    over the (size DESC, id) rank (NOT DuckDB list_reduce, whose
    grouped lambda fold measured nondeterministic under parallel
    aggregation), and within 2x of optimal bin count (the classical
    NF bound; FFD's 11/9 needs per-bin state a set-based oracle could
    not replay exactly).
    Oversized single files (> target) get a bin of their own, exactly
    like OPTIMIZE leaves them alone.

    Per-partition state is the partition's FILE LIST — bounded by file
    counts (thousands), not rows; the fold never leaves the executor.
    Returns per partition: (n_files, total_bytes, n_bins,
    avg_bin_fill) with one IEEE division."""
    f = files.select(
        F.col(partition_col).alias("__pt"),
        F.col(size_col).cast("bigint").alias("__sz"),
        F.col(id_col).alias("__id"),
    )
    packed = (
        f.groupBy("__pt")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("__sz").cast("bigint").alias("total_bytes"),
            F.array_sort(
                F.collect_list(F.struct((-F.col("__sz")).alias("negsz"), F.col("__id"), F.col("__sz")))
            ).alias("__sorted"),
        )
        .withColumn(
            "__fold",
            F.aggregate(
                F.col("__sorted"),
                F.struct(
                    F.lit(0).cast("bigint").alias("bins"),
                    F.lit(0).cast("bigint").alias("load"),
                ),
                lambda acc, x: F.when(
                    (acc["bins"] == 0) | (acc["load"] + x["__sz"] > F.lit(int(target_bytes))),
                    F.struct(
                        (acc["bins"] + 1).alias("bins"), x["__sz"].alias("load")
                    ),
                ).otherwise(
                    F.struct(acc["bins"].alias("bins"), (acc["load"] + x["__sz"]).alias("load"))
                ),
            ),
        )
    )
    return packed.select(
        F.col("__pt").alias(partition_col),
        "n_files",
        "total_bytes",
        F.col("__fold.bins").cast("bigint").alias("n_bins"),
        (
            F.col("total_bytes").cast("double")
            / (F.col("__fold.bins").cast("double") * F.lit(float(target_bytes)))
        ).alias("avg_bin_fill"),
    )


def clustering_depth(
    df: DataFrame,
    *,
    order_col: str,
    zone_col: str,
    bucket_rows: int = 1000,
    n_probes: int = 64,
) -> DataFrame:
    """Clustering-depth audit (the Delta-OPTIMIZE / Z-cube metric):
    at each of ``n_probes`` evenly-spaced probe points across the
    ``zone_col`` domain, how many files' [zmin, zmax] zones CONTAIN
    the point — depth 1 means a point lookup touches one file
    (perfectly clustered), depth ≈ n_files means the column is
    shuffled across every file and zone maps are useless for it.
    The companion to ``zone_map_skip_audit``: that one prices a
    specific predicate, this one summarizes the LAYOUT itself.

    Files are cut by the same engine-independent arithmetic rank as
    the skip audit (dense two-phase rank over ``order_col``, exact
    integer ``div`` — no physical row order anywhere).  Probe points
    are exact integer-µs arithmetic on the data's own [lo, hi] span:
    p_i = lo + (i·(hi−lo)) div (n_probes−1).

    Scale: the zone frame is #files rows (metadata); the probe join
    is n_probes × #files on a broadcast ``n_probes``-row frame —
    bounded, allowlisted.  Returns ONE row (n_files, n_probes,
    avg_depth, max_depth) with avg_depth = mean over probes of the
    containment count (two IEEE divisions)."""
    from .windows import grouped_cumsum_two_phase

    keyed = df.select(
        F.col(order_col).alias("__k"), F.col(zone_col).alias("__z")
    )
    per_key = keyed.groupBy("__k").agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    ranked = grouped_cumsum_two_phase(
        per_key, [], ["__k"], ["__c"], exclusive=True
    ).select("__k", F.col("__cum___c").alias("__start"))
    zones = (
        keyed.join(ranked, "__k")
        .withColumn(
            "__file", F.expr(f"__start div {int(bucket_rows)}").cast("bigint")
        )
        .groupBy("__file")
        .agg(
            F.min(F.unix_micros(F.col("__z"))).alias("__zmin"),
            F.max(F.unix_micros(F.col("__z"))).alias("__zmax"),
        )
    )
    span = df.agg(
        F.min(F.unix_micros(F.col(zone_col))).alias("__lo"),
        F.max(F.unix_micros(F.col(zone_col))).alias("__hi"),
    )
    probes = (
        df.sparkSession.range(0, n_probes)
        .select(F.col("id").cast("bigint").alias("__i"))
        .crossJoin(F.broadcast(span))
        .select(
            "__i",
            (
                F.col("__lo")
                + F.expr(f"(__i * (__hi - __lo)) div {int(n_probes) - 1}")
            ).alias("__p"),
        )
    )
    depth = (
        zones.join(
            F.broadcast(probes),
            (F.col("__zmin") <= F.col("__p")) & (F.col("__p") <= F.col("__zmax")),
            "right",
        )
        .groupBy("__i")
        .agg(
            F.sum(F.when(F.col("__file").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("__d")
        )
    )
    nf = zones.agg(F.count(F.lit(1)).cast("bigint").alias("n_files"))
    return depth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum("__d").cast("bigint").alias("__sd"),
        F.max("__d").cast("bigint").alias("max_depth"),
    ).crossJoin(F.broadcast(nf)).select(
        "n_files",
        "n_probes",
        F.round(
            F.col("__sd").cast("double") / F.col("n_probes").cast("double"), 6
        ).alias("avg_depth"),
        "max_depth",
    )
