"""Joins (SURVEY.md §2.3 J1-J2): broadcast dim enrichment, hour-bucket
time join, and as-of join.

J2 is the reference's declared trips⋈weather "by time and zone" join
(reference: readme.md:134-137). Two Spark-native forms:

- **bucket join**: truncate the event time to the observation cadence
  (hour) and equi-join — cheap, exact when the small side has exactly
  one row per bucket (the weather feed appends 1 row/hour,
  weather_realtime_etl.py:157);
- **as-of join**: most recent observation at-or-before each event —
  Spark has no native ASOF; expressed as a composition of built-ins:
  union both sides tagged, one window pass carrying the last
  observation forward, then keep the probe rows. No cross join, no
  per-group Python — one sort-shuffle on the group key, which is the
  same cost class as any windowed time-series op at 100 TB; skewed
  keys go through AQE skew-join/window splitting.

The dim/weather side is tiny → explicit ``F.broadcast`` so the plan
does not depend on stats being fresh at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F, types as T


def broadcast_enrich(
    facts: DataFrame, dim: DataFrame, on: Sequence[str] | None = None, how: str = "inner", **eq
) -> DataFrame:
    """Equi-join with an explicitly broadcast small side (zones/nation-
    style dims, FIXTURES.md A4)."""
    if on is not None:
        return facts.join(F.broadcast(dim), on=list(on), how=how)
    (lk, rk), = eq.items()
    return facts.join(F.broadcast(dim), facts[lk] == dim[rk], how)


def hour_bucket_join(
    events: DataFrame,
    observations: DataFrame,
    *,
    event_ts: str,
    obs_ts: str,
    keys: Sequence[str] = (),
    how: str = "left",
) -> DataFrame:
    """J2 bucket form: date_trunc both sides to the hour + equi-join.
    Exact when observations are unique per (keys, hour)."""
    ev = events.withColumn("__hour", F.date_trunc("hour", F.col(event_ts)))
    ob = observations.withColumn("__hour", F.date_trunc("hour", F.col(obs_ts)))
    joined = ev.join(F.broadcast(ob), on=[*keys, "__hour"], how=how)
    return joined.drop("__hour")


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Band/range join: attach the band row whose ``[lo, hi)`` interval
    contains ``value_col``.

    The band table is assumed small (price tiers, SLA buckets, time
    ranges) and is explicitly broadcast; with only range predicates the
    physical plan is a BroadcastNestedLoopJoin, which is O(facts ×
    bands) per partition — fine when bands is tens-to-thousands of
    rows, and it never shuffles the fact side. If the band table ever
    grows beyond broadcast size, convert to an equi-join first: assign
    both sides a coarse grid cell (``floor(value / grid)``), equi-join
    on the cell, then apply the residual between-predicate — that is
    the standard shuffle-safe rewrite and keeps AQE in play.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond, how)


def exists_join(probe: DataFrame, sub: DataFrame, cond) -> DataFrame:
    """Correlated EXISTS as a left-semi join (what Catalyst decorrelates
    EXISTS subqueries into): keep probe rows with >=1 match, never
    duplicating probe rows — no distinct needed on ``sub``."""
    return probe.join(sub, cond, "left_semi")


def not_exists_join(probe: DataFrame, sub: DataFrame, cond) -> DataFrame:
    """Correlated NOT EXISTS as a left-anti join (same NULL semantics
    as SQL NOT EXISTS: a NULL-keyed probe row survives only if the
    condition never evaluates true)."""
    return probe.join(sub, cond, "left_anti")


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    *,
    on: Sequence[str],
    probe_ts: str,
    build_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance_micros: int | None = None,
) -> DataFrame:
    """ASOF join via tagged union + window pass(es) — never a range or
    nested-loop join.

    ``direction``:
    - ``backward`` (default): build row with the greatest
      ``build_ts`` <= ``probe_ts`` (equal timestamps match);
    - ``forward``: build row with the smallest ``build_ts`` >=
      ``probe_ts`` (equal timestamps match) — the polars/kdb
      forward-fill sibling;
    - ``nearest``: whichever of the two is closer in time, ties to
      backward (the polars convention).

    ``tolerance_micros``: when set, a match farther than this from the
    probe timestamp yields NULLs instead (applied to the winning side
    under ``nearest``).

    Cost: one (keys, ts)-sort shuffle of the union; ``forward`` orders
    the same partitioning descending-by-side so backward+forward
    together still plan as two window passes over ONE exchanged
    dataset (no extra shuffle, one extra in-partition sort) — the
    same class as any windowed time-series op at 100 TB. Output
    schema: probe columns + value_cols.
    """
    on = list(on)
    value_cols = list(value_cols)
    probe_payload = [c for c in probe.columns if c not in on]
    ts_type = build.schema[build_ts].dataType

    p = probe.select(
        *on,
        F.col(probe_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in probe_payload],
        *[F.lit(None).cast(build.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
        F.lit(None).cast(ts_type).alias("__bt"),
    )
    b = build.select(
        *on,
        F.col(build_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"__p_{c}") for c in probe_payload],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(build_ts).alias("__bt"),
    )
    u = p.unionByName(b)

    want_back = direction in ("backward", "nearest")
    want_fwd = direction in ("forward", "nearest")
    if not (want_back or want_fwd):
        raise ValueError(f"unknown asof direction: {direction!r}")

    if want_back:
        # build (side 0) sorts before a same-ts probe -> inclusive match
        wb = (
            W.partitionBy(*on)
            .orderBy(F.col("__t").asc(), F.col("__side").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        for c in value_cols:
            u = u.withColumn(f"__b_{c}", F.last(f"__v_{c}", ignorenulls=True).over(wb))
        u = u.withColumn("__b_t", F.last("__bt", ignorenulls=True).over(wb))
    if want_fwd:
        # probe first at equal ts (side desc) -> same-ts build is ahead
        wf = (
            W.partitionBy(*on)
            .orderBy(F.col("__t").asc(), F.col("__side").desc())
            .rowsBetween(0, W.unboundedFollowing)
        )
        for c in value_cols:
            u = u.withColumn(f"__f_{c}", F.first(f"__v_{c}", ignorenulls=True).over(wf))
        u = u.withColumn("__f_t", F.first("__bt", ignorenulls=True).over(wf))

    out = u.filter(F.col("__side") == 1)

    def us(col: str):
        # micros for either timestamp flavor (a constant NTZ->TZ offset
        # cancels in the deltas), raw bigint otherwise
        if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
            return F.unix_micros(F.col(col).cast("timestamp"))
        return F.col(col).cast("bigint")

    far = F.lit(2**62)
    if direction == "nearest":
        db = F.when(F.col("__b_t").isNotNull(), us("__t") - us("__b_t")).otherwise(far)
        df_ = F.when(F.col("__f_t").isNotNull(), us("__f_t") - us("__t")).otherwise(far)
        use_back = db <= df_
        out = out.withColumn("__m_t", F.when(use_back, F.col("__b_t")).otherwise(F.col("__f_t")))
        for c in value_cols:
            out = out.withColumn(
                f"__m_{c}", F.when(use_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
            )
    else:
        side = "b" if direction == "backward" else "f"
        out = out.withColumn("__m_t", F.col(f"__{side}_t"))
        for c in value_cols:
            out = out.withColumn(f"__m_{c}", F.col(f"__{side}_{c}"))

    if tolerance_micros is not None:
        within = F.col("__m_t").isNotNull() & (
            F.abs(us("__m_t") - us("__t")) <= F.lit(int(tolerance_micros))
        )
        for c in value_cols:
            out = out.withColumn(f"__m_{c}", F.when(within, F.col(f"__m_{c}")))

    sel = [F.col(k) for k in on]
    sel += [F.col(f"__p_{c}").alias(c) for c in probe_payload]
    sel += [F.col(f"__m_{c}").alias(c) for c in value_cols]
    return out.select(*sel)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_micros: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Large×large interval-overlap join (closed intervals:
    ``l_start <= r_end AND r_start <= l_end``) as an EQUI-join on time
    bins — the standard rewrite of a non-equi range predicate that
    Spark would otherwise plan as a nested-loop/cartesian.

    Each side explodes its interval into the epoch-micro bins it
    covers (``sequence(start div w, end div w)``); the pair meets on
    (keys…, bin) in an ordinary hash join; the overlap predicate is
    the post-probe residual. A pair overlapping several shared bins
    would duplicate, so each pair is kept ONLY in its first shared
    bin — ``bin == greatest(l_start, r_start) div w`` — which
    deduplicates arithmetically, with no distinct shuffle.

    Scale posture: shuffle volume = Σ interval_span/bin_width per row
    (pick ``bin_micros`` near the median interval length so the
    explosion factor stays O(1)); the join hashes on (keys, bin), so
    time spreads the load even when ``keys`` is empty — no task sees
    more than one bin's worth of pairs. Both outputs keep their input
    columns; prefix/alias them before the call if names collide.
    """
    w = int(bin_micros)

    def bin_of(col_name: str):
        # exact BIGINT FLOOR division (matches DuckDB's `//` for ANY
        # sign): Spark's `div` truncates toward zero, which would
        # misbin pre-1970 timestamps; subtracting the non-negative
        # pmod first makes the dividend an exact multiple, where div
        # and floor agree.
        us = f"unix_micros({col_name})"
        return F.expr(f"({us} - pmod({us}, {w}L)) div {w}L")

    lb = left.withColumn("__bin", F.explode(F.sequence(bin_of(left_start), bin_of(left_end))))
    rb = right.withColumn("__bin", F.explode(F.sequence(bin_of(right_start), bin_of(right_end))))
    joined = lb.join(rb, on=[*keys, "__bin"])
    overlap = (F.unix_micros(F.col(left_start)) <= F.unix_micros(F.col(right_end))) & (
        F.unix_micros(F.col(right_start)) <= F.unix_micros(F.col(left_end))
    )
    gmax = f"greatest(unix_micros({left_start}), unix_micros({right_start}))"
    first_shared = F.col("__bin") == F.expr(f"({gmax} - pmod({gmax}, {w}L)) div {w}L")
    return joined.where(overlap & first_shared).drop("__bin")
