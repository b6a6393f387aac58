"""Cleaning contract: project + rename + cast + null-drop + predicate
filters + sample cap (SURVEY.md §2.2 P1-P4, §2.5 O1).

Re-expresses the reference's core transform
(reference: dags/etl_spark_historical.py:182-195):

    select 7 of ~19 columns with aliases  → P1
    cast ids→int, measures→double        → P2
    dropna on 4 key columns              → P3
    two NULL-rejecting > 0 filters       → P4
    limit(200_000) sampling cap          → O1

All steps are single-pass Catalyst expressions: the select/cast/filter
chain collapses into the Parquet scan (column pruning + predicate
pushdown), so at 100 TB this is one scan stage with no shuffle. The
200k cap is a *sample knob*, not a hard cap — pass ``cap=None`` for
full-scale runs (the reference's constant exists only to fit its
single-node CSV hop, which we do not reproduce).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def clean_contract(
    df: DataFrame,
    *,
    columns: Mapping[str, Column],
    required: Sequence[str] = (),
    positive: Sequence[str] = (),
    cap: int | None = None,
) -> DataFrame:
    """Generic select/rename/cast → dropna → positive-filter → cap.

    ``columns`` maps output name → input expression (the projection is
    explicit, so Catalyst prunes the scan to exactly these columns).
    ``required`` columns get the reference's dropna-subset semantics
    (etl_spark_historical.py:191); ``positive`` get the NULL-rejecting
    ``> 0`` comparison filters (:192-193).
    """
    out = df.select(*[expr.alias(name) for name, expr in columns.items()])
    if required:
        out = out.dropna(subset=list(required))
    for c in positive:
        out = out.filter(F.col(c) > 0)
    if cap is not None:
        # Plain limit: nondeterministic row choice, same as the
        # reference (etl_spark_historical.py:195). Ordered/seeded
        # variants for testability live in the caller.
        out = out.limit(cap)
    return out


def clean_trips(df: DataFrame, cap: int | None = 200_000) -> DataFrame:
    """The reference transform verbatim-in-capability, for real TLC
    parquet input (etl_spark_historical.py:182-195)."""
    return clean_contract(
        df,
        columns={
            "pickup_datetime": F.col("tpep_pickup_datetime"),
            "dropoff_datetime": F.col("tpep_dropoff_datetime"),
            "pickup_zone_id": F.col("PULocationID").cast("int"),
            "dropoff_zone_id": F.col("DOLocationID").cast("int"),
            "passenger_count": F.col("passenger_count").cast("int"),
            "trip_distance": F.col("trip_distance").cast("double"),
            "total_amount": F.col("total_amount").cast("double"),
        },
        required=["pickup_datetime", "dropoff_datetime", "pickup_zone_id", "dropoff_zone_id"],
        positive=["trip_distance", "total_amount"],
        cap=cap,
    )


def clean_lineitem_as_trips(df: DataFrame) -> DataFrame:
    """The same contract exercised on the driver's ``lineitem`` fixture
    (FIXTURES.md §B mapping: l_shipdate↔pickup ts, int keys↔zone ids,
    positive doubles↔distance/amount). No cap → deterministic, oracle-checkable.
    """
    return clean_contract(
        df,
        columns={
            "ship_date": F.col("l_shipdate"),
            "order_key": F.col("l_orderkey"),
            "part_zone_id": F.col("l_partkey").cast("int"),
            "supp_zone_id": F.col("l_suppkey").cast("int"),
            "line_number": F.col("l_linenumber").cast("int"),
            "quantity": F.col("l_quantity").cast("double"),
            "extended_price": F.col("l_extendedprice").cast("double"),
        },
        required=["ship_date", "order_key", "part_zone_id", "supp_zone_id"],
        positive=["quantity", "extended_price"],
        cap=None,
    )


CLEAN_LINEITEM_ORACLE = """
SELECT
  l_shipdate                 AS ship_date,
  l_orderkey                 AS order_key,
  CAST(l_partkey AS INTEGER) AS part_zone_id,
  CAST(l_suppkey AS INTEGER) AS supp_zone_id,
  CAST(l_linenumber AS INTEGER) AS line_number,
  CAST(l_quantity AS DOUBLE)      AS quantity,
  CAST(l_extendedprice AS DOUBLE) AS extended_price
FROM lineitem
WHERE l_shipdate IS NOT NULL AND l_orderkey IS NOT NULL
  AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
  AND l_quantity > 0 AND l_extendedprice > 0
"""


def quality_report(
    df: DataFrame,
    *,
    rules: "Sequence[tuple[str, Column]]" = (),
    unique: "Sequence[Sequence[str]]" = (),
    fk: "Sequence[tuple[Sequence[str], DataFrame, Sequence[str]]]" = (),
) -> DataFrame:
    """Declarative data-quality expectations (the dbt-test family the
    reference's verification queries gesture at, readme.md:149-187):
    evaluate every check in ONE pass shape and return (rule,
    n_violations) — zero rows pass silently is NOT the contract; every
    rule reports, so a disappearing check is visible.

    - ``rules``: (name, violation_condition Column) — counted with a
      conditional sum in a single scan over the table, however many
      rules there are (no per-rule scans).
    - ``unique``: key column lists; violations = rows in excess of one
      per key (groupBy count > 1 — one shuffle per key set, on the
      key projection only).
    - ``fk``: (child_cols, parent_df, parent_cols) referential checks;
      violations = child rows with no parent (left_anti on the parent
      key projection — AQE broadcasts dim-sized parents).

    At 100 TB: the rule scan is one pass; unique/fk checks shuffle
    narrow key projections only; results are #checks rows.
    """
    from pyspark.sql import functions as F

    reports = []
    if rules:
        agg_cols = [
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"__r{i}")
            for i, (_, cond) in enumerate(rules)
        ]
        wide = df.agg(*agg_cols)
        stack = ", ".join(
            f"'{name}', __r{i}" for i, (name, _) in enumerate(rules)
        )
        reports.append(
            wide.selectExpr(
                f"stack({len(rules)}, {stack}) as (rule, n_violations)"
            )
        )
    for cols in unique:
        key = [F.col(c) for c in cols]
        dup = (
            df.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .agg(
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                .cast("bigint")
                .alias("n_violations")
            )
            .select(
                F.lit(f"unique({', '.join(cols)})").alias("rule"), "n_violations"
            )
        )
        reports.append(dup)
    for child_cols, parent, parent_cols in fk:
        pk = parent.select(
            *[F.col(p).alias(c) for c, p in zip(child_cols, parent_cols)]
        ).distinct()
        orphans = (
            df.select(*[F.col(c) for c in child_cols])
            .join(pk, list(child_cols), "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(
                F.lit(
                    f"fk({', '.join(child_cols)})"
                ).alias("rule"),
                "n_violations",
            )
        )
        reports.append(orphans)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def fd_profile(
    df: DataFrame, candidates: Sequence[tuple[Sequence[str], str]]
) -> DataFrame:
    """Functional-dependency violation profile — the cross-COLUMN data
    quality check (q43 profiles columns in isolation): for each
    candidate FD "lhs → rhs", does every lhs group determine exactly
    one rhs value? Reports per candidate the lhs group count, how many
    groups violate (|distinct rhs| > 1), and the worst group's distinct
    count — the profiling step that validates assumed keys/hierarchies
    before a pipeline relies on them (Papenbrock et al. VLDB'15 frame
    the discovery problem; this is the targeted-verification form).

    Shape: one exact distinct-count aggregation per candidate (map-side
    partial distinct), each collapsing to a 1-row summary — the k
    summaries union. All counts exact integers. Returns
    (fd, n_lhs_groups, n_violating_groups, max_rhs_per_group)."""
    outs = []
    for lhs, rhs in candidates:
        lhs = list(lhs)
        per_group = df.groupBy(*lhs).agg(F.countDistinct(rhs).alias("__n_rhs"))
        outs.append(
            per_group.agg(
                F.lit("+".join(lhs) + "->" + rhs).alias("fd"),
                F.count(F.lit(1)).alias("n_lhs_groups"),
                F.sum(F.when(F.col("__n_rhs") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating_groups"),
                F.max("__n_rhs").alias("max_rhs_per_group"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("fd")


def ri_audit(
    edges: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit across declared FK edges — the
    cross-TABLE data-quality sibling of ``fd_profile``: for each
    ``(name, child_df, child_key, parent_df, parent_key)``, count the
    child rows whose key has no parent (the warehouse's dangling-FK
    report, run before a pipeline trusts its joins).

    Per edge: child_rows (key NOT NULL), null_keys, distinct_keys, and
    the orphan side via LEFT ANTI against the parent's distinct key
    set — orphan_rows and orphan_keys. All exact BIGINTs, no division.

    Scale: one anti-join per edge (Catalyst broadcasts small parents
    — nation/region — automatically; big parents hash-shuffle on the
    key, the join's natural partitioning); each edge collapses to ONE
    summary row, the k rows union. The anti-join consumes the
    parent's DISTINCT key frame, so a fat parent row never rides the
    shuffle.
    """
    outs = []
    for name, child, ckey, parent, pkey in edges:
        keyed = child.select(F.col(ckey).alias("__k"))
        orphans = keyed.where(F.col("__k").isNotNull()).join(
            parent.select(F.col(pkey).alias("__k")).distinct(), "__k", "left_anti"
        )
        # count("__k") counts NON-NULL keys; countDistinct ignores
        # nulls natively — one pass for the child-side stats
        stats = keyed.agg(
            F.count("__k").cast("bigint").alias("child_rows"),
            F.coalesce(F.sum(F.col("__k").isNull().cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias("null_keys"),
            F.countDistinct("__k").cast("bigint").alias("distinct_keys"),
        )
        orph = orphans.agg(
            F.count(F.lit(1)).cast("bigint").alias("orphan_rows"),
            F.countDistinct("__k").cast("bigint").alias("orphan_keys"),
        )
        outs.append(
            stats.crossJoin(orph).select(
                F.lit(name).alias("edge"),
                "child_rows",
                "null_keys",
                "distinct_keys",
                "orphan_rows",
                "orphan_keys",
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("edge")
