"""Aggregations (SURVEY.md §2.4 A1-A3 + the declared grouped analytics).

The reference's own aggregate surface is count / min / max
(reference: dags/etl_spark_historical.py:197,342-343; readme.md:151-166).
Grouped aggregation is the declared-but-deferred dbt layer
("analyze demand and delays by weather", readme.md:136-137) — here it
is first-class via groupBy.

Scale + determinism note: double-precision SUM is order-dependent, and
at 1000 executors partial-aggregate ordering is nondeterministic run
to run. Money-like measures are therefore summed as DECIMAL —
associative, exact, identical on any cluster size and in the DuckDB
oracle — and only the *final* scalar is cast back to double. Partial
(map-side) aggregation still applies: decimal sum is a regular
declarative agg, so Catalyst does partial→final automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dsum(col: str | Column, scale: int = 4) -> Column:
    """Exact order-independent sum of a double column via decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: str | Column, scale: int = 4) -> Column:
    """Exact-sum average: decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def count_star(df: DataFrame) -> DataFrame:
    """A2: scalar COUNT(*) (readme.md:151-152)."""
    return df.agg(F.count(F.lit(1)).alias("cnt"))


def min_max(df: DataFrame, col: str, lo: str = "first_val", hi: str = "last_val") -> DataFrame:
    """A3: MIN/MAX date-range check (readme.md:163-166)."""
    return df.agg(F.min(col).alias(lo), F.max(col).alias(hi))


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped grouped rollup over the lineitem fixture —
    the grouped-analytics capability the reference defers to dbt.

    One shuffle on the (low-cardinality) group keys; partial aggs
    map-side. Survives 100× scale because group cardinality is O(1).
    """
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("sum_disc_price"),
            F.round(davg("l_quantity"), 6).alias("avg_qty"),
            F.round(davg("l_extendedprice"), 6).alias("avg_price"),
            F.round(davg("l_discount", 6), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity       AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice  AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
  ROUND(CAST(SUM(CAST(l_quantity      AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity), 6)      AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount      AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount), 6)      AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def exact_heavy_hitters(items: DataFrame, col: str, *, k_inv: int) -> DataFrame:
    """EXACT frequent items — every value with frequency > n/``k_inv``
    — without shuffling the full value domain.

    Two phases:
    1. Per-partition Misra-Gries summaries (capacity ``k_inv``) via
       ``mapInPandas``: each task streams its partition once in Arrow
       batches, keeping at most ``k_inv`` counters (merge rule: add the
       batch's counts, then subtract the (cap+1)-th largest count from
       all and drop non-positives — Agarwal et al., "Mergeable
       Summaries", PODS'12). Guarantee: any value absent from EVERY
       summary has per-partition count <= n_p/(cap+1), so global count
       <= n/(k_inv+1) < n/k_inv — the union of summaries is a SUPERSET
       of the true heavy hitters.
    2. Exact recount of only the candidates: a broadcast semi-join
       (candidates <= partitions x k_inv rows — metadata-sized) and one
       small groupBy, then the exact threshold filter.

    Because phase 2 recounts exactly and filters on the true n/k_inv,
    the output is DETERMINISTIC and independent of partitioning or
    batch order, even though intermediate MG contents are not — which
    is what makes an approximate-prefilter pipeline oracle-checkable.
    At 100 TB the alternative (groupBy over every distinct token) is a
    full-domain shuffle; this shuffles candidate rows only.
    """
    import pandas as pd

    cap = k_inv
    dtype = items.schema[col].dataType.simpleString()

    def mg_summaries(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > cap:
                kth = sorted(counters.values(), reverse=True)[cap]
                counters = {v: c - kth for v, c in counters.items() if c > kth}
        yield pd.DataFrame({col: list(counters.keys())})

    candidates = items.mapInPandas(mg_summaries, schema=f"{col} {dtype}").distinct()
    n = items.count()
    return (
        items.join(F.broadcast(candidates), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > n / k_inv)
    )


def binned_quantiles(
    df: DataFrame,
    col: str,
    *,
    quantiles: "list[float]",
    bin_width: float,
) -> DataFrame:
    """Single-pass quantile estimates from a fixed-width binned
    histogram — the mergeable, deterministic alternative to both exact
    quantiles (global sort / whole-group buffering) and
    approx_percentile (estimator-defined, engine-specific).

    Pass 1: one map-side-combined groupBy builds the histogram —
    #bins = value-range / bin_width rows, metadata-sized for any input
    volume, and partials merge by addition (mergeable-summary
    property: shard histograms sum). Pass 2: a cumulative sum over the
    tiny bin frame locates each quantile's target rank
    (floor(q·(n-1)), the 0-based lower-interpolation convention) and
    estimates the value at the bin's interior midpoint offset
    ((pos+0.5)/bin_count). Error is bounded by bin_width/2 — CHOSEN,
    not estimator luck — and every step is integer arithmetic plus one
    IEEE multiply, so two engines agree bit-for-bit: an approximate
    quantile that value-hash checks.

    The single-partition window runs over #bins rows (not data rows);
    callers size bin_width so #bins stays metadata-class.
    """
    from pyspark.sql import Window

    bins = (
        df.select(F.floor(F.col(col) / F.lit(bin_width)).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.withColumn("cum", F.sum("c").over(w)).withColumn(
        "prev", F.col("cum") - F.col("c")
    )
    total = df.agg(F.count(F.lit(1)).alias("n"))
    qf = df.sparkSession.createDataFrame([(float(q),) for q in quantiles], "q double")
    # 1-row total and #quantiles-row frames broadcast onto the bin frame
    t = cum.join(F.broadcast(total)).join(F.broadcast(qf))
    target = F.floor(F.col("q") * (F.col("n") - 1)).cast("bigint")
    hit = t.where((F.col("prev") <= target) & (target < F.col("cum")))
    est = (
        F.col("bin").cast("double") * F.lit(bin_width)
        + F.lit(bin_width)
        * ((target - F.col("prev")).cast("double") + F.lit(0.5))
        / F.col("c").cast("double")
    )
    return hit.select(F.col("q"), est.alias("value_est")).orderBy("q")


def hourly_demand(events: DataFrame) -> DataFrame:
    """Demand by hour bucket × type — the trips⋈weather-era analytics
    shape (readme.md:136-137) on the events fixture: date_trunc to the
    hour + groupBy. Equivalent to a tumbling window (F.window) in the
    streaming variant (streaming/pipeline.py)."""
    return (
        events.withColumn("hour_bucket", F.date_trunc("hour", F.col("ts")))
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
            F.round(davg("value"), 6).alias("avg_value"),
        )
    )


HOURLY_DEMAND_ORACLE = """
SELECT
  date_trunc('hour', ts) AS hour_bucket,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""



def hll_distinct(
    df: DataFrame,
    *,
    group_keys: list[str],
    value_col: str,
    p: int = 9,
) -> DataFrame:
    """Mergeable HyperLogLog distinct-count sketch with ENGINE-STABLE
    hashing — the oracle-checkable sibling of
    ``approx_count_distinct`` (whose HLL++ registers hash with
    engine-local xxhash, so a second engine can never reproduce them;
    the q55-native-minhash argument applied to cardinality).

    Construction, all exact integer arithmetic:
    - 60-bit md5 hash (functions/hashing.md5_int60) of the value's
      string form; low ``p`` bits pick one of m=2^p buckets, the
      remaining w=60-p bits feed the rank;
    - rank = leading-zero count + 1 = (w+1) - length(bin(rest)) —
      ``bin()`` renders identically on any engine, no float log2
      (whose libm rounding at 2^k-1 boundaries genuinely diverges);
    - registers = MAX(rank) per (group, bucket) — MAX is what makes
      sketches MERGEABLE: shards/partitions/days combine by register-
      wise max, the property a 100 TB rollup needs;
    - the harmonic denominator is kept INTEGER-SCALED:
      d_scaled = (m - used)·2^(w+1) + Σ 2^(w+1-rank)  (fits BIGINT for
      p>=9), so the final estimate is one double division of exact
      integers — deterministic IEEE, no order-dependent float sum.

    Returns per group: n_used buckets, d_scaled, and hll_estimate
    (raw HLL estimator; small/large-range corrections intentionally
    omitted — they need ln(), which is engine-libm-dependent, and the
    oracle checks bit-equality, not accuracy tuning).

    Scale: one narrow map + two map-side-combinable groupBys; the
    sketch state is m rows per group, independent of input size.
    (All sketch constants — bucket count, rank width, the alpha_m
    numerator — live in hll_registers/hll_from_registers, which this
    wrapper merely composes.)
    """
    regs = hll_registers(df, group_keys=group_keys, value_col=value_col, p=p)
    return hll_from_registers(regs, group_keys=group_keys, p=p)


def hll_registers(
    df: DataFrame,
    *,
    group_keys: list[str],
    value_col: str,
    p: int = 9,
) -> DataFrame:
    """The MERGEABLE half of ``hll_distinct``: per-group registers
    (group_keys..., __bkt, __r). Registers from any partitioning of
    the data — per day, per shard, per replica — combine by
    register-wise MAX over the same (group, bucket) grid and yield the
    IDENTICAL estimate the direct computation gives; that algebraic
    property is what a 100 TB daily-rollup pipeline relies on."""
    from ..functions.hashing import md5_int60

    m = 1 << p
    s_ = 60 - p + 1
    h = md5_int60(F.col(value_col).cast("string"))
    rb = (
        df.select(*group_keys, h.alias("__h"))
        .select(
            *group_keys,
            (F.col("__h") % F.lit(m)).alias("__bkt"),
            # exact BIGINT division (h is non-negative 60-bit; a double
            # division here would lose bits above 2^53)
            F.expr(f"__h div {m}L").alias("__rest"),
        )
    )
    rank = F.when(F.col("__rest") == 0, F.lit(s_)).otherwise(
        F.lit(s_) - F.length(F.bin(F.col("__rest")))
    )
    return (
        rb.withColumn("__r", rank)
        .groupBy(*group_keys, "__bkt")
        .agg(F.max("__r").alias("__r"))
    )


def hll_merge_registers(regs: DataFrame, *, group_keys: list[str]) -> DataFrame:
    """Merge register sets that share bucket columns by register-wise
    MAX — e.g. collapse (event_type, day) registers to event_type."""
    return regs.groupBy(*group_keys, "__bkt").agg(F.max("__r").alias("__r"))


def hll_from_registers(
    regs: DataFrame,
    *,
    group_keys: list[str],
    p: int = 9,
) -> DataFrame:
    """Estimate from registers (see ``hll_distinct`` for the exact
    integer-scaled construction)."""
    m = 1 << p
    s_ = 60 - p + 1
    num = 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << s_)
    out = regs.groupBy(*group_keys).agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(F.expr(f"shiftleft(1L, {s_} - __r)")).alias("__sumpow"),
    )
    d_scaled = (
        (F.lit(m) - F.col("n_used")) * F.lit(1 << s_) + F.col("__sumpow")
    ).cast("bigint")
    return out.select(
        *group_keys,
        "n_used",
        d_scaled.alias("d_scaled"),
        (F.lit(num) / d_scaled.cast("double")).alias("hll_estimate"),
    )


def hll_sliding_distinct(
    df: DataFrame,
    *,
    day_col: str,
    value_col: str,
    window_days: int = 7,
    p: int = 9,
) -> DataFrame:
    """Trailing-``window_days`` DISTINCT count per active day via
    MERGEABLE HLL registers — the sketch form of q134's exact rolling
    WAU. This is THE reason sketches earn their place in a 100 TB
    pipeline: the raw-data pass happens ONCE (per-day registers, m
    rows/day state); every window is then a register-wise MAX over
    ``window_days`` register sets — daily history is never rescanned,
    and backfilling a new window length touches only the register
    store.

    Shape: per-day registers (one map-side-combined groupBy) →
    CONTRIBUTION EXPLODE (each day's m-row register set is exploded to
    the ``window_days`` windows it serves — register volume, not data
    volume) → max-merge per (window, bucket) → estimate. Output rows
    only for windows ending on an OBSERVED day (equi semi-join — no
    scalar broadcast needed).

    Register math is ``hll_registers``'s engine-stable integer
    construction, so the whole sliding computation value-hash-checks
    (q184). Returns (win_end, n_used, d_scaled, hll_estimate)."""
    regs = hll_registers(df, group_keys=[day_col], value_col=value_col, p=p)
    contrib = regs.select(
        F.explode(
            F.sequence(F.col(day_col), F.date_add(F.col(day_col), window_days - 1))
        ).alias("win_end"),
        "__bkt",
        "__r",
    )
    days = df.select(F.col(day_col).alias("win_end")).distinct()
    merged = (
        contrib.join(days, "win_end", "left_semi")
        .groupBy("win_end", "__bkt")
        .agg(F.max("__r").alias("__r"))
    )
    return hll_from_registers(merged, group_keys=["win_end"], p=p)


def grouped_weighted_median(
    df: DataFrame,
    *,
    group_keys: list[str],
    value_col: str,
    weight_col: str,
    scale: int = 4,
) -> DataFrame:
    """Exact WEIGHTED median per group: the smallest value v whose
    cumulative weight reaches half the group's total (the lower
    weighted median — the estimator robust statistics and
    cost-weighted SLA reporting use; reduces to the ordinary lower
    median at unit weights).

    Shape: (group, value) pre-aggregation first — the value domain is
    what gets windowed, not the raw rows, so a group with 10^9 rows
    over 10^4 distinct values windows 10^4 rows — then one cumulative
    decimal sum ordered by value (window PARTITIONED by group,
    partition-parallel) and a min(struct) selection of the first
    qualifying value. Weights sum as DECIMAL: exact, associative,
    order-independent — double cumsums would make the >= comparison
    engine-dependent at the boundary.
    """
    from pyspark.sql import Window as W

    dec = f"decimal(18,{scale})"
    per_val = df.groupBy(*group_keys, value_col).agg(
        F.sum(F.col(weight_col).cast(dec)).alias("__w")
    )
    w_cum = (
        W.partitionBy(*group_keys)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_tot = W.partitionBy(*group_keys)
    cum = per_val.select(
        *group_keys,
        F.col(value_col),
        F.sum("__w").over(w_cum).alias("__cum"),
        F.sum("__w").over(w_tot).alias("__tot"),
    )
    return (
        cum.where(F.col("__cum") * 2 >= F.col("__tot"))
        .groupBy(*group_keys)
        .agg(F.min(F.col(value_col)).alias("weighted_median"))
    )


def grouped_entropy(
    df: DataFrame,
    *,
    group_keys: list[str],
    value_col: str,
) -> DataFrame:
    """Per-group Shannon entropy and Gini impurity of a categorical
    column — the data-profiling pair behind split-quality scoring and
    drift monitors.

    Determinism: entropy = ln(n) - (Σ c·ln c)/n. The per-category
    terms c·ln(c) are IEEE doubles, but their distributed SUM would be
    order-dependent — so each term is rounded to DECIMAL(28,12) first
    and summed exactly (the aggregates-module rule applied to a float
    expression: quantize-then-sum). Gini needs only Σc² — exact
    integers all the way. Output rounded to 6dp.

    Two map-side-combinable shuffles: (group, value) counts, then the
    per-group fold; state per group = #distinct values."""
    counts = df.groupBy(*group_keys, value_col).agg(F.count(F.lit(1)).alias("__c"))
    term = (F.col("__c") * F.log(F.col("__c").cast("double"))).cast("decimal(28,12)")
    agg = counts.groupBy(*group_keys).agg(
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(term).alias("__clnc"),
        F.sum(F.col("__c") * F.col("__c")).alias("__c2"),
    )
    n = F.col("__n").cast("double")
    return agg.select(
        *group_keys,
        "n_distinct",
        F.round(F.log(n) - F.col("__clnc").cast("double") / n, 6).alias("entropy"),
        F.round(F.lit(1.0) - F.col("__c2").cast("double") / (n * n), 6).alias("gini"),
    )


def count_min_sketch(
    df: DataFrame,
    *,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) with
    ENGINE-STABLE hashing: fixed depth×width counter grid, row i
    hashing v with md5_int60(i || ':' || v) % width. Like
    ``hll_registers``, determinism is the point — the sketch a second
    engine (or a second day's shard) builds is bit-identical, so
    sketches MERGE by cellwise addition and estimates oracle-check
    exactly.

    Shape: one narrow map exploding each row into ``depth`` (row,
    bucket) cells in-row, then one map-side-combinable groupBy —
    state is depth×width counters regardless of input size.
    Returns (row_idx, bucket, cnt)."""
    from ..functions.hashing import md5_int60

    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_idx"),
                (
                    md5_int60(
                        F.concat(F.lit(f"{i}:"), F.col(value_col).cast("string"))
                    )
                    % F.lit(width)
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row_idx").alias("row_idx"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    *,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from a ``count_min_sketch``:
    est(v) = min_i sketch[i][h_i(v)] — an upper bound on the true
    count (collisions only ADD), within εn with probability 1−δ for
    width=e/ε, depth=ln(1/δ). The query side recomputes the same
    md5 cells and probes the sketch with one equi-join; the sketch is
    depth×width rows — broadcastable at any corpus size."""
    from ..functions.hashing import md5_int60

    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_idx"),
                (
                    md5_int60(
                        F.concat(F.lit(f"{i}:"), F.col(value_col).cast("string"))
                    )
                    % F.lit(width)
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    probes = queries.select(F.col(value_col), F.explode(cells).alias("c")).select(
        value_col, F.col("c.row_idx").alias("row_idx"), F.col("c.bucket").alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["row_idx", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


def grouped_autocorr(
    df: DataFrame,
    *,
    group_keys: list[str],
    order_col: str,
    value_col: str,
    lags: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Per-group autocorrelation r_k at the given lags over a series
    ordered by ``order_col`` — the seasonality/persistence diagnostic
    of demand analysis.

    r_k = Σ (x_t − x̄)(x_{t+k} − x̄) / Σ (x_t − x̄)², with x̄ from an
    exact decimal sum and every float PRODUCT quantized to
    DECIMAL(28,10) before its distributed sum (the grouped_entropy
    rule) so results are partition-order-independent. Lags come from
    one window pass per lag, all PARTITIONED by group —
    partition-parallel, never a global sort."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*group_keys).orderBy(F.col(order_col).asc())
    g = W.partitionBy(*group_keys)
    x = F.col(value_col).cast("double")
    mean = (
        F.sum(F.col(value_col).cast("decimal(18,4)")).over(g).cast("double")
        / F.count(value_col).over(g)
    )
    base = df.select(
        *group_keys,
        order_col,
        x.alias("__x"),
        mean.alias("__m"),
        *[F.lead(x, k).over(w).alias(f"__x{k}") for k in lags],
    )
    dec = lambda c: c.cast("decimal(28,10)")  # noqa: E731
    d = F.col("__x") - F.col("__m")
    aggs = [F.sum(dec(d * d)).alias("__den")]
    for k in lags:
        dk = F.col(f"__x{k}") - F.col("__m")
        aggs.append(F.sum(dec(d * dk)).alias(f"__num{k}"))
    out = base.groupBy(*group_keys).agg(F.count(F.lit(1)).alias("n_obs"), *aggs)
    return out.select(
        *group_keys,
        "n_obs",
        *[
            F.round(
                F.col(f"__num{k}").cast("double") / F.col("__den").cast("double"), 6
            ).alias(f"r{k}")
            for k in lags
        ],
    )


def kmv_sketch(
    df: DataFrame,
    *,
    group_keys: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """K-minimum-values (theta) sketch per group: the k smallest
    md5-60bit hashes of the distinct values (Bar-Yossef et al. '02 /
    the DataSketches theta family). Unlike HLL (union-only), KMV
    sketches support set INTERSECTION estimates — audience overlap —
    because the k smallest hashes are a uniform coordinated sample of
    the value universe, identical across engines/tables for the same
    values (md5 is content-defined).

    Shape: distinct (group, hash) rows, then one grouped sort-window
    keeping rank <= k — the q111 grouped-top-k class: per-group state
    is the sort (spillable), output is k rows/group. Two sketches over
    the same hash function are COORDINATED: equal values hash equal,
    which is what makes cross-sketch membership tests meaningful.
    Returns (group_keys..., __h) rows."""
    from pyspark.sql import Window as W

    from ..functions.hashing import md5_int60

    hv = (
        df.select(*group_keys, md5_int60(F.col(value_col).cast("string")).alias("__h"))
        .distinct()
    )
    w = W.partitionBy(*group_keys).orderBy(F.col("__h").asc())
    return (
        hv.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(sketch: DataFrame, *, group_keys: list[str], k: int = 256) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: exact when the group
    holds fewer than k distinct values (the sketch IS the value set),
    else (k-1) * 2^60 / h_(k) — one double division of exact integers,
    engine-deterministic."""
    out = sketch.groupBy(*group_keys).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max("__h").alias("__hk"),
    )
    return out.select(
        *group_keys,
        "n_sketch",
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(
            F.lit(float((k - 1)) * float(1 << 60)) / F.col("__hk").cast("double")
        )
        .alias("kmv_estimate"),
    )


def kmv_overlap(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    *,
    k: int = 256,
) -> DataFrame:
    """Set-overlap estimate from two coordinated KMV sketches (no
    group keys — one sketch per side): take the k smallest hashes of
    the UNION of the two sketches (itself a valid KMV sketch of
    A ∪ B), estimate |A ∪ B| from its kth value, measure the fraction
    of those union-sample hashes present in BOTH sketches (an unbiased
    Jaccard estimate — the union sketch is a uniform sample of A ∪ B),
    and multiply: |A ∩ B| ≈ jaccard_est · union_est.

    Everything is exact integer set algebra on <= 2k rows until the
    two final divisions. Returns one row:
    (n_union_sketch, union_estimate, jaccard_est, intersection_est)."""
    from pyspark.sql import Window as W

    a = sketch_a.select(F.col("__h")).withColumn("__in_a", F.lit(1))
    b = sketch_b.select(F.col("__h")).withColumn("__in_b", F.lit(1))
    both = a.join(b, "__h", "full").select(
        "__h",
        F.coalesce("__in_a", F.lit(0)).alias("__in_a"),
        F.coalesce("__in_b", F.lit(0)).alias("__in_b"),
    )
    w = W.orderBy(F.col("__h").asc())  # <= 2k rows: metadata-sized window
    uni = both.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)
    agg = uni.agg(
        F.count(F.lit(1)).alias("n_union_sketch"),
        F.max("__h").alias("__hk"),
        F.sum((F.col("__in_a") * F.col("__in_b"))).alias("__n_both"),
    )
    union_est = F.when(
        F.col("n_union_sketch") < k, F.col("n_union_sketch").cast("double")
    ).otherwise(F.lit(float(k - 1) * float(1 << 60)) / F.col("__hk").cast("double"))
    return agg.select(
        "n_union_sketch",
        F.round(union_est, 4).alias("union_estimate"),
        F.round(F.col("__n_both") / F.col("n_union_sketch"), 6).alias("jaccard_est"),
        F.round(union_est * F.col("__n_both") / F.col("n_union_sketch"), 4).alias(
            "intersection_est"
        ),
    )


def chi_square_crosstab(
    df: DataFrame,
    *,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Chi-square independence statistic over the row_col × col_col
    contingency table — the categorical-drift / feature-independence
    test of data profiling. Observed counts are exact integers;
    expected counts E = row_total·col_total/n are IEEE doubles from
    exact integers; the (O−E)²/E terms are quantized to
    DECIMAL(28,10) before the distributed sum (the q158 rule).

    Two map-side-combinable aggregations over the CELL domain (#rows ×
    #cols rows, metadata-sized for categorical data) plus tiny margin
    frames. Returns one row: (n, n_rows, n_cols, dof, chi2)."""
    cells = df.groupBy(row_col, col_col).agg(F.count(F.lit(1)).alias("__o"))
    rowm = cells.groupBy(row_col).agg(F.sum("__o").alias("__rt"))
    colm = cells.groupBy(col_col).agg(F.sum("__o").alias("__ct"))
    tot = cells.agg(F.sum("__o").alias("__n"))
    # The FULL row x col grid, not just observed cells: a zero cell
    # contributes (0-E)^2/E = E, and dropping it understates chi2
    # (caught by the perfect-dependence test: diagonal 2x2 must give
    # chi2 = n). Margins join on a constant key — an equi hash join,
    # metadata-sized, never a CartesianProduct.
    grid = rowm.withColumn("__k", F.lit(1)).join(
        colm.withColumn("__k", F.lit(1)), "__k"
    )
    e = (
        grid.join(cells, [row_col, col_col], "left")
        .withColumn("__o", F.coalesce(F.col("__o"), F.lit(0)))
        .join(F.broadcast(tot), how="cross")
        .withColumn("__e", F.col("__rt") * F.col("__ct") / F.col("__n"))
    )
    # (o-e)*(o-e), never pow(x, 2): libm pow rounding is engine-specific
    d = F.col("__o") - F.col("__e")
    term = (d * d / F.col("__e")).cast("decimal(28,10)")
    return e.agg(
        F.max("__n").alias("n"),
        F.countDistinct(row_col).alias("n_rows"),
        F.countDistinct(col_col).alias("n_cols"),
        (
            (F.countDistinct(row_col) - 1) * (F.countDistinct(col_col) - 1)
        ).alias("dof"),
        F.round(F.sum(term).cast("double"), 6).alias("chi2"),
    )


def correlation_matrix(
    df: DataFrame,
    *,
    measures: list[str],
    scale: int = 4,
) -> DataFrame:
    """Pearson correlation for every measure pair in ONE scan: all
    moment sums (Σx, Σx², Σxy) are EXACT decimal aggregates — one
    map-side-combinable pass over the fact table, (2m + m(m-1)/2 + 1)
    counters of state — and each r is then a few IEEE ops on exact
    integers-as-doubles (sqrt is correctly rounded; no pow, no
    order-dependent float sums anywhere), so the whole matrix
    value-hash checks. The profiling sibling of q161's ACF.

    Returns (var_x, var_y, corr) for the m(m-1)/2 unordered pairs."""
    dec = f"decimal(18,{scale})"
    aggs = [F.count(F.lit(1)).alias("__n")]
    for m in measures:
        c = F.col(m).cast(dec)
        aggs.append(F.sum(c).alias(f"__s_{m}"))
        aggs.append(F.sum(c * c).alias(f"__ss_{m}"))
    for i, a in enumerate(measures):
        for b in measures[i + 1 :]:
            aggs.append(
                F.sum(F.col(a).cast(dec) * F.col(b).cast(dec)).alias(f"__p_{a}_{b}")
            )
    one = df.agg(*aggs)
    n = F.col("__n").cast("double")

    def corr(a: str, b: str):
        sx = F.col(f"__s_{a}").cast("double")
        sy = F.col(f"__s_{b}").cast("double")
        sxx = F.col(f"__ss_{a}").cast("double")
        syy = F.col(f"__ss_{b}").cast("double")
        sxy = F.col(f"__p_{a}_{b}").cast("double")
        return F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        )

    rows = [
        F.struct(
            F.lit(a).alias("var_x"), F.lit(b).alias("var_y"), corr(a, b).alias("corr")
        )
        for i, a in enumerate(measures)
        for b in measures[i + 1 :]
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def discrete_quantile_cuts(
    df: DataFrame,
    *,
    value_col: str,
    group_keys: list[str],
    fracs: list[tuple[int, int]],
    weight_col: str | None = None,
    two_phase: bool = False,
) -> DataFrame:
    """Type-1 (discrete, lower-nearest-rank) quantile cut points per
    group: for each fraction num/den, the cut is the SMALLEST value
    whose cumulative count reaches ``ceil(num * n / den)`` — i.e. an
    ACTUAL DATA VALUE selected by pure integer rank arithmetic, never
    an interpolated float.

    This is the determinism backbone for every operator that BUCKETS
    rows by comparing data against quantile cuts (WoE/IV, PSI): a
    type-7 interpolated cut is synthesized by floating-point
    arithmetic whose last bit depends on the engine's interpolation
    form (``lo + g*(hi-lo)`` vs ``(1-g)*lo + g*hi``, FMA contraction,
    libm build), and when data values sit exactly ON a cut — the
    common case for granular telemetry — a 1-ulp cut drift silently
    moves every tied row across the bucket boundary (the q240
    round-10/11 driver reds). A rank-selected cut is a bit-identical
    parquet double on every engine, so the ``>`` bucket fold below it
    is exact by construction. Ties all land in the same bucket (the
    statistically honest WoE/PSI reading); the rank inequality
    ``cum >= ceil(num*n/den)`` is evaluated cross-multiplied
    (``cum * den >= num * n``) so no division ever happens.

    Scale shape: one combinable groupBy to the per-group DISTINCT-
    VALUE histogram (bounded by value cardinality; pass ``weight_col``
    to feed an ALREADY-COUNTED (value, weight) frame and skip the raw
    scan entirely — the q168 one-scan restructure), then ONE exchange
    on the group keys carrying both the cumulative window and the
    group-total window (round-13 optimization: the former separate
    totals aggregation + broadcast join-back computed the same sum
    with an extra exchange and join), a |fracs|-way inline literal
    explode (a Generate node — no per-call createDataFrame/broadcast),
    and a collect_list bounded by |fracs|. No interpolation anywhere.
    The cumulative window is per-group single-task over the DISTINCT
    domain — fine for quantized/bounded domains (the kendall_tau_b
    grid rule); for a raw continuous domain at cluster scale pass
    ``two_phase=True`` to ride ``windows.grouped_cumsum_two_phase``
    (the skew-proof range-exchange prefix sum — bit-identical result,
    test-pinned; ~3x slower at local[32] sizes where its exchange
    overhead dominates, which is why it is opt-in).

    Returns one row per group: group_keys + ``__cuts``
    array<value-type> sorted ascending (duplicates kept — one entry
    per fraction — so bucket numbering stays 1..den stable).
    """
    from pyspark.sql import Window as W

    from .windows import grouped_cumsum_two_phase

    gk = list(group_keys)
    v = F.col(value_col)
    if weight_col is None:
        hist = (
            df.where(v.isNotNull())
            .groupBy(*gk, v.alias("__hv"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("__hc"))
        )
    else:
        hist = (
            df.where(v.isNotNull())
            .groupBy(*gk, v.alias("__hv"))
            .agg(F.sum(F.col(weight_col)).cast("bigint").alias("__hc"))
        )
    if two_phase:
        # skew-proof cluster-scale path: group totals via an
        # aggregation + broadcast join-back (a full-partition window
        # here would reintroduce the single-task-per-group stage
        # two_phase exists to avoid)
        totals = hist.groupBy(*gk).agg(F.sum("__hc").cast("bigint").alias("__n"))
        cum0 = grouped_cumsum_two_phase(
            hist, gk, ["__hv"], ["__hc"]
        ).withColumnRenamed("__cum___hc", "__cum")
        cum = (
            cum0.join(F.broadcast(totals), gk)
            if gk
            else cum0.crossJoin(F.broadcast(totals))
        )
    else:
        # default (histogram-sized) path: the group total rides a
        # second window over the SAME partitioning as the cumsum —
        # one exchange total, no totals aggregation, no join-back
        # (guide §2.4: operations keyed the same way share one
        # exchange).  Values are identical: sum(__hc) per group.
        w_cum = (
            W.partitionBy(*gk)
            .orderBy("__hv")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        w_all = W.partitionBy(*gk)
        cum = hist.withColumn("__cum", F.sum("__hc").over(w_cum)).withColumn(
            "__n", F.sum("__hc").over(w_all)
        )
    # fraction pairs as an inline literal explode — a Generate node
    # instead of a createDataFrame (one driver->executor parallelize
    # job) + BroadcastNestedLoopJoin per call
    kpairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(n_)).cast("bigint").alias("__kn"),
                    F.lit(int(d_)).cast("bigint").alias("__kd"),
                )
                for n_, d_ in fracs
            ]
        )
    )
    # cum >= ceil(kn*n/kd)  ⟺  cum*kd >= kn*n   (all BIGINT, exact)
    cut_rows = (
        cum.select(*gk, "__hv", "__cum", "__n", kpairs.alias("__k"))
        .select(
            *gk,
            "__hv",
            "__cum",
            "__n",
            F.col("__k.__kn").alias("__kn"),
            F.col("__k.__kd").alias("__kd"),
        )
        .where(F.col("__cum") * F.col("__kd") >= F.col("__kn") * F.col("__n"))
        .groupBy(*gk, "__kn", "__kd")
        .agg(F.min("__hv").alias("__cut"))
    )
    return cut_rows.groupBy(*gk).agg(
        F.array_sort(F.collect_list("__cut")).alias("__cuts")
    )


def population_stability(
    df: DataFrame,
    *,
    group_keys: list[str],
    value_col: str,
    ts_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between the first and second time
    halves of a value distribution — the standard model-monitoring
    drift score (PSI < 0.1 stable, > 0.25 action):

        PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)

    with buckets = exact DECILES OF THE FIRST HALF (the expected
    distribution, the industry convention), p/q the add-one-smoothed
    bucket shares of each half (smoothing makes empty buckets finite
    AND deterministic — no epsilon tuning).

    Determinism: the time split is the exact type-7 median of epoch
    MICROS — safe because the inputs are integers below 2^53, so both
    halves of the interpolation are exact IEEE doubles on every
    engine. The decile cuts, by contrast, are over arbitrary doubles
    where interpolation is NOT engine-stable, so they are type-1
    DISCRETE cuts from ``discrete_quantile_cuts`` — actual first-half
    data values selected by integer rank arithmetic (the q240 fix:
    rows tied exactly on a cut can no longer flip buckets on a 1-ulp
    interpolation drift). Bucket assignment is an in-row comparison
    fold of bit-identical parquet doubles; the per-bucket ln terms
    follow the grouped_entropy rule — IEEE doubles quantized to
    DECIMAL(28,12) BEFORE the distributed sum, result rounded to 6dp.

    Scale shape: one pass for the split boundary (1-row broadcast),
    one histogram groupBy + distinct-value window for the cuts
    (#groups × value-cardinality rows, broadcast join-back), one
    bucket-count aggregation (group × half × bucket — metadata-
    sized), the PSI fold on that. Raw rows are scanned twice
    (boundary + bucketing); no data-sized window, no cross join.

    Brand-new groups — zero rows in the first time half, so no decile
    cuts exist — are the purest drift signal a PSI monitor exists to
    flag, so they are EMITTED, not dropped (round-6 advice): they come
    back with n_first=0 and psi NULL (PSI against an empty expected
    distribution is undefined; NULL is the honest score and the
    monitor alerts on n_first=0 directly).

    Returns per group: (…, n_first, n_second, psi).
    """
    us = F.unix_micros(F.col(ts_col))
    boundary = df.agg(F.percentile(us, 0.5).alias("__mid"))
    marked = df.crossJoin(F.broadcast(boundary)).select(
        *group_keys,
        F.col(value_col).cast("double").alias("__v"),
        (F.unix_micros(F.col(ts_col)).cast("double") <= F.col("__mid"))
        .cast("int")
        .alias("__first"),
    )
    cuts = discrete_quantile_cuts(
        marked.where(F.col("__first") == 1),
        value_col="__v",
        group_keys=group_keys,
        fracs=[(i, n_buckets) for i in range(1, n_buckets)],
    )
    bucket = F.lit(1) + F.aggregate(
        F.transform(F.col("__cuts"), lambda c: (F.col("__v") > c).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    counts = (
        marked.join(F.broadcast(cuts), group_keys)
        .select(*group_keys, "__first", bucket.alias("__b"))
        .groupBy(*group_keys, "__b")
        .agg(
            F.sum("__first").cast("bigint").alias("__c1"),
            F.sum(F.lit(1) - F.col("__first")).cast("bigint").alias("__c2"),
        )
    )
    # group totals as windows over the metadata-sized counts frame —
    # one exchange on the group keys instead of a totals aggregation +
    # join-back (round-13, guide §2.4); the downstream groupBy reuses
    # the same partitioning, so it adds no exchange either
    from pyspark.sql import Window as W

    w_g = W.partitionBy(*group_keys)
    j = counts.withColumn(
        "__n1", F.sum("__c1").over(w_g).cast("bigint")
    ).withColumn("__n2", F.sum("__c2").over(w_g).cast("bigint"))
    p = (F.col("__c1") + 1).cast("double") / (F.col("__n1") + n_buckets).cast("double")
    q = (F.col("__c2") + 1).cast("double") / (F.col("__n2") + n_buckets).cast("double")
    term = ((p - q) * F.log(p / q)).cast("decimal(28,12)")
    present = j.groupBy(*group_keys).agg(
        F.max("__n1").alias("n_first"),
        F.max("__n2").alias("n_second"),
        F.round(F.sum(term).cast("double"), 6).alias("psi"),
    )
    # groups with no first-half rows have no cuts row: surface them
    new_groups = (
        marked.join(F.broadcast(cuts.select(*group_keys)), group_keys, "left_anti")
        .groupBy(*group_keys)
        .agg(
            F.lit(0).cast("bigint").alias("n_first"),
            F.count(F.lit(1)).cast("bigint").alias("n_second"),
            F.lit(None).cast("double").alias("psi"),
        )
    )
    return present.unionByName(new_groups).orderBy(*group_keys)


def cross_corr_lags(
    series: DataFrame,
    *,
    order_col: str,
    x_col: str,
    y_col: str,
    max_lag: int = 24,
) -> DataFrame:
    """Normalized cross-correlation between two INTEGER series at lags
    0..max_lag (does x lead y, and by how much?) — the lead-lag
    diagnostic next to grouped_autocorr's self-lag.

    rho_k = Pearson over the overlapping pairs (x_t, y_{t+k}), all
    five moment sums exact DECIMAL(38,0) over BIGINT products (counts
    in, so no float ever sums distributed); ONE fixed-parenthesization
    division with IEEE-correctly-rounded sqrt, round 6. best_lag rides
    every row via a struct-max over the (max_lag+1)-row lag frame
    (max rho, ties to the SMALLEST lag).

    Scale: the input is a time-granularity series frame (hours/days —
    metadata-sized by construction, document at call sites), so the
    unpartitioned LEAD windows and the lag frame are both bounded; the
    raw-data reduction happens upstream in the series aggregation.
    """
    from pyspark.sql import Window as W

    w = W.orderBy(F.col(order_col).asc())
    x = F.col(x_col).cast("bigint")
    y = F.col(y_col).cast("bigint")
    base = series.select(
        x.alias("__x"),
        *[F.lead(y, k).over(w).alias(f"__y{k}") for k in range(max_lag + 1)],
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    aggs = []
    for k in range(max_lag + 1):
        yk = F.col(f"__y{k}")
        cond = yk.isNotNull()
        aggs += [
            F.sum(cond.cast("bigint")).cast("bigint").alias(f"__n{k}"),
            F.sum(F.when(cond, dec(F.col("__x")))).alias(f"__sx{k}"),
            F.sum(dec(yk)).alias(f"__sy{k}"),
            F.sum(dec(F.col("__x") * yk)).alias(f"__sxy{k}"),
            F.sum(F.when(cond, dec(F.col("__x") * F.col("__x")))).alias(f"__sxx{k}"),
            F.sum(dec(yk * yk)).alias(f"__syy{k}"),
        ]
    m = base.agg(*aggs)
    lag_rows = []
    for k in range(max_lag + 1):
        n = F.col(f"__n{k}").cast("decimal(38,0)")
        num = (n * F.col(f"__sxy{k}") - F.col(f"__sx{k}") * F.col(f"__sy{k}")).cast(
            "double"
        )
        dx = (n * F.col(f"__sxx{k}") - F.col(f"__sx{k}") * F.col(f"__sx{k}")).cast(
            "double"
        )
        dy = (n * F.col(f"__syy{k}") - F.col(f"__sy{k}") * F.col(f"__sy{k}")).cast(
            "double"
        )
        lag_rows.append(
            F.struct(
                F.lit(k).alias("lag"),
                F.col(f"__n{k}").alias("n_overlap"),
                # constant overlap segment -> NULL, not an ANSI error
                F.when(
                    (dx > 0) & (dy > 0),
                    F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6),
                ).alias("rho"),
            )
        )
    lags = m.select(F.explode(F.array(*lag_rows)).alias("__l")).select(
        F.col("__l.lag").alias("lag"),
        F.col("__l.n_overlap").alias("n_overlap"),
        F.col("__l.rho").alias("rho"),
    )
    wb = W.partitionBy()  # (max_lag+1)-row frame — metadata-sized
    best = F.max(
        F.struct(F.col("rho").alias("r"), (-F.col("lag")).alias("nl"))
    ).over(wb)
    return lags.select(
        "lag", "n_overlap", "rho", (-best.getField("nl")).cast("int").alias("best_lag")
    ).orderBy("lag")


def grouped_moments(
    df: DataFrame,
    *,
    group_keys: list[str],
    value_col: str,
) -> DataFrame:
    """Per-group skewness and excess kurtosis from exact raw moments —
    the distribution-shape profile beyond q158's entropy and q168's
    MAD (heavy tail? asymmetric?), deterministic where the built-in
    ``skewness``/``kurtosis`` aggregates are not (their float update
    order is partition-dependent).

    Raw power sums S1..S4 are per-row IEEE products quantized to
    DECIMAL(38,10) before the distributed sum (the grouped_entropy
    rule), central moments assembled by fixed-parenthesization
    arithmetic on the exact sums:

        m2 = S2/n - mean^2
        m3 = S3/n - 3*mean*(S2/n) + 2*mean^3
        m4 = S4/n - 4*mean*(S3/n) + 6*mean^2*(S2/n) - 3*mean^4
        skewness = m3 / (m2 * sqrt(m2)),  kurtosis_excess = m4/m2^2 - 3

    (sqrt is IEEE-correctly-rounded; no pow). One combinable
    aggregation pass; everything after lives on the #groups frame.
    """
    dec = lambda c: c.cast("decimal(38,10)")  # noqa: E731
    x = F.col(value_col).cast("double")
    m = (
        df.where(x.isNotNull())
        .groupBy(*group_keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(dec(x)).alias("__s1"),
            F.sum(dec(x * x)).alias("__s2"),
            F.sum(dec(x * x * x)).alias("__s3"),
            F.sum(dec(x * x * x * x)).alias("__s4"),
        )
    )
    n = F.col("n").cast("double")
    mean = F.col("__s1").cast("double") / n
    r2 = F.col("__s2").cast("double") / n
    r3 = F.col("__s3").cast("double") / n
    r4 = F.col("__s4").cast("double") / n
    m2 = r2 - mean * mean
    m3 = r3 - F.lit(3.0) * mean * r2 + F.lit(2.0) * mean * mean * mean
    m4 = (
        r4
        - F.lit(4.0) * mean * r3
        + F.lit(6.0) * mean * mean * r2
        - F.lit(3.0) * mean * mean * mean * mean
    )
    return m.select(
        *group_keys,
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(m2, 6).alias("variance"),
        # constant group: zero variance -> NULL shape stats, not an
        # ANSI divide-by-zero error
        F.when(m2 > 0, F.round(m3 / (m2 * F.sqrt(m2)), 6)).alias("skewness"),
        F.when(m2 > 0, F.round(m4 / (m2 * m2) - F.lit(3.0), 6)).alias(
            "kurtosis_excess"
        ),
    ).orderBy(*group_keys)


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    max_offset: int = 4,
) -> DataFrame:
    """Weekly cohort retention triangle: users are assigned to the ISO
    week of their FIRST event (the cohort), and each later active week
    counts them as retained at offset = (active_week - cohort_week) in
    weeks — the standard growth/retention matrix (the longitudinal
    companion to q179's period-over-period growth accounting: q179
    says how many users churned this week; the triangle says how each
    ACQUISITION WEEK decays over its lifetime).

    Exact semantics: week = date_trunc('week', ts) as DATE (Monday
    start on both engines); a user is active at offset k for cohort c
    iff they have >= 1 event in week c+k; offset 0 is the cohort size
    by construction (retention 1.0 — kept in the output as the
    self-check row). Offsets beyond ``max_offset`` are dropped (the
    triangle is reported over a fixed horizon).

    Shape: first-event agg (one combinable min per user), a distinct
    (user, week) projection, one user-keyed equi-join (AQE
    shuffle-or-broadcast), then a (cohort, offset) count-distinct —
    no window, no self-join of the fact table. Counts are exact
    BIGINTs; retention is the single IEEE division.

    Returns (cohort_week, week_offset, n_active, n_cohort, retention)."""
    firsts = (
        df.groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(F.col(ts_col)).alias("__first_ts"))
        .select(
            "__u", F.date_trunc("week", F.col("__first_ts")).cast("date").alias("__cw")
        )
    )
    active = (
        df.select(
            F.col(user_col).alias("__u"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("__aw"),
        )
        .distinct()
    )
    joined = active.join(firsts, "__u").withColumn(
        "__off", (F.datediff(F.col("__aw"), F.col("__cw")) / F.lit(7)).cast("int")
    )
    cells = (
        joined.where(F.col("__off") <= max_offset)
        .groupBy("__cw", "__off")
        .agg(F.countDistinct("__u").cast("bigint").alias("n_active"))
    )
    sizes = firsts.groupBy("__cw").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    return cells.join(sizes, "__cw").select(
        F.col("__cw").alias("cohort_week"),
        F.col("__off").alias("week_offset"),
        "n_active",
        "n_cohort",
        (F.col("n_active").cast("double") / F.col("n_cohort").cast("double")).alias(
            "retention"
        ),
    )


def grouped_mahalanobis2(
    df: DataFrame,
    *,
    group_keys: list[str],
    x1_col: str,
    x2_col: str,
    cutoff: float = 9.0,
) -> DataFrame:
    """Per-group bivariate Mahalanobis outlier audit over two INTEGER
    features: squared Mahalanobis distance of every point from the
    group mean under the group's own (population) covariance, solved
    closed-form via the 2x2 inverse — no linear-algebra library, the
    q249/grouped_ols2 Cramer idiom applied to anomaly detection.

        cov   = [[s11, s12], [s12, s22]]   (biased /n moments)
        d^2   = (dx1*(s22*dx1 - s12*dx2) + dx2*(s11*dx2 - s12*dx1))
                / det

    Sufficient statistics (S1, S2, S11, S22, S12) are exact BIGINTs
    (integer features), so the IEEE stage starts from identical inputs
    on both engines and runs one fixed-parenthesization expression per
    row. Degenerate groups (det <= 0: a constant or perfectly
    collinear feature pair) report NULL ``det``-derived stats
    (``max_d2`` is NULL) rather than a division error — but
    ``n_outliers`` comes back 0, not NULL: the per-row
    when(d2 > cutoff, 1).otherwise(0) counts a NULL d2 as "not an
    outlier", and the q259 oracle mirrors that 0. Consumers must key
    degeneracy off ``det``/``max_d2``, never off n_outliers == 0.

    Scale: one combinable aggregation for the moments (#groups frame),
    one equi-join back onto the rows (AQE broadcasts the tiny stats
    frame), one final per-group aggregation. Returns (group_keys...,
    n, det, n_outliers, max_d2) where n_outliers counts d^2 >
    ``cutoff`` (the 3-sigma ellipse at the default 9.0)."""
    gk = list(group_keys)
    x1 = F.col(x1_col).cast("bigint")
    x2 = F.col(x2_col).cast("bigint")
    m = (
        df.groupBy(*gk)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(x1).cast("bigint").alias("__s1"),
            F.sum(x2).cast("bigint").alias("__s2"),
            F.sum(x1 * x1).cast("bigint").alias("__s11"),
            F.sum(x2 * x2).cast("bigint").alias("__s22"),
            F.sum(x1 * x2).cast("bigint").alias("__s12"),
        )
    )
    nf = F.col("n").cast("double")
    m1 = F.col("__s1").cast("double") / nf
    m2 = F.col("__s2").cast("double") / nf
    s11 = F.col("__s11").cast("double") / nf - m1 * m1
    s22 = F.col("__s22").cast("double") / nf - m2 * m2
    s12 = F.col("__s12").cast("double") / nf - m1 * m2
    stats = m.select(
        *gk,
        "n",
        m1.alias("__m1"),
        m2.alias("__m2"),
        s11.alias("__c11"),
        s22.alias("__c22"),
        s12.alias("__c12"),
        (s11 * s22 - s12 * s12).alias("__det"),
    )
    dx1 = F.col(x1_col).cast("double") - F.col("__m1")
    dx2 = F.col(x2_col).cast("double") - F.col("__m2")
    d2 = (
        dx1 * (F.col("__c22") * dx1 - F.col("__c12") * dx2)
        + dx2 * (F.col("__c11") * dx2 - F.col("__c12") * dx1)
    ) / F.col("__det")
    return (
        df.join(stats, gk)
        .withColumn("__d2", F.when(F.col("__det") > 0, d2))
        .groupBy(*gk)
        .agg(
            F.max("n").alias("n"),
            F.round(F.max("__det"), 6).alias("det"),
            F.sum(F.when(F.col("__d2") > F.lit(float(cutoff)), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
            F.round(F.max("__d2"), 6).alias("max_d2"),
        )
    )


def effective_sample_size(
    df: DataFrame,
    *,
    group_keys: list[str],
    weight_col: str,
) -> DataFrame:
    """Kish effective sample size of INTEGER-weighted sampling per
    group: ESS = (sum w)^2 / (sum w^2) — the importance-weighting
    diagnostic next to q189's DSIR weights (how many "real" samples a
    weighted corpus is worth; ESS/n near 1 = uniform, near 1/n = one
    document dominates).

    Exact BIGINT sums with DECIMAL(19,0) factor casts for the squares
    (the spearman rule — w^2 and (sum w)^2 both overflow int64 well
    inside real corpus sizes), one IEEE division for the ratio.
    Returns (group_keys..., n, sum_w, ess, ess_ratio)."""
    gk = list(group_keys)
    w = F.col(weight_col).cast("bigint")
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    m = (
        df.where(w.isNotNull())
        .groupBy(*gk)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(d19(w)).cast("decimal(38,0)").alias("__sw"),
            F.sum(d19(w) * d19(w)).alias("__sw2"),
        )
    )
    return m.select(
        *gk,
        "n",
        F.col("__sw").cast("double").alias("sum_w"),
        F.when(
            F.col("__sw2") > 0,
            (F.col("__sw").cast("double") * F.col("__sw").cast("double"))
            / F.col("__sw2").cast("double"),
        ).alias("ess"),
        F.when(
            (F.col("__sw2") > 0) & (F.col("n") > 0),
            (F.col("__sw").cast("double") * F.col("__sw").cast("double"))
            / F.col("__sw2").cast("double")
            / F.col("n").cast("double"),
        ).alias("ess_ratio"),
    )


# Poisson(1) CDF thresholds for the deterministic multinomial-ish
# bootstrap (weights 0..5 cover 1 - 6e-4 of the mass; the tail is
# clamped to 5).  Literal doubles so both engines compare against
# bit-identical constants.
POISSON1_CDF = (
    0.36787944117144233,  # P(X <= 0)
    0.7357588823428847,   # P(X <= 1)
    0.9196986029286058,   # P(X <= 2)
    0.9810118431238462,   # P(X <= 3)
    0.9963401531726563,   # P(X <= 4)
)


def grouped_bootstrap_ci(
    df: DataFrame,
    *,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    n_resamples: int = 32,
    seed: int = 42,
    scale: int = 4,
) -> DataFrame:
    """Per-group bootstrap confidence interval for the MEAN with
    DETERMINISTIC, engine-stable resampling — the Poisson bootstrap
    (each row enters resample b with weight ~ Poisson(1), the
    standard distributed approximation of multinomial resampling,
    cf. Chamandy et al., Google 2012): weight_b(row) is derived from
    md5(id) pushed through the b-th universal-hash permutation
    (hashing.minhash_params — the q55 machinery reused as a counter-
    based RNG), compared against baked Poisson(1) CDF literals.  No
    RNG state, no shuffle of randomness — ANY engine reproduces the
    identical resample, which is what makes the CI oracle-checkable.

    ALL ``n_resamples`` resample sums run in ONE map-side-combinable
    aggregation (2·B conditional sums per group: Σw and Σw·v with v
    DECIMAL-quantized, the dsum rule); the per-group sort of B means
    happens IN-ROW on a B-length array (array_sort on the #groups
    frame).  ci = the empirical 1/16 and 15/16 quantiles of the B
    means (ranks 2 and 31 at B=32).

    Returns (group_cols..., n, mean, ci_lo, ci_hi) round 6."""
    from ..functions.hashing import MERSENNE_P, md5_int60, minhash_params

    params = minhash_params(n_resamples, seed)
    h = (md5_int60(F.col(id_col).cast("string")) % F.lit(MERSENNE_P)).alias("__h")
    v = F.col(value_col).cast(f"decimal(18,{scale})")
    base = df.select(
        *[F.col(c) for c in group_cols], h, v.alias("__v")
    )

    def w_b(a: int, b: int):
        u = ((F.col("__h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)).cast(
            "double"
        ) / F.lit(float(MERSENNE_P))
        w = F.lit(5)
        for i in range(len(POISSON1_CDF) - 1, -1, -1):
            w = F.when(u < F.lit(POISSON1_CDF[i]), F.lit(i)).otherwise(w)
        return w

    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__v").alias("__sv"),
    ]
    for j, (a, b) in enumerate(params):
        w = w_b(a, b)
        aggs.append(F.sum(w.cast("bigint")).cast("bigint").alias(f"__n{j}"))
        aggs.append(F.sum(F.col("__v") * w.cast("int")).alias(f"__s{j}"))
    per = base.groupBy(*group_cols).agg(*aggs)
    # A resample whose total weight is 0 (likely for 1-2 row groups,
    # P~e^-n per resample) would be 0/0: Spark NULL (array_sort LAST)
    # but DuckDB inf/NaN or NULLS-FIRST — engine and oracle could
    # disagree on the quantile ranks.  Substitute the group's overall
    # mean (never degenerate for a non-empty group) so both engines
    # fold the degenerate resample identically (round-8 ADVICE).
    overall = F.col("__sv").cast("double") / F.col("n").cast("double")
    means = F.array_sort(
        F.array(
            *[
                F.when(
                    F.col(f"__n{j}") > 0,
                    F.col(f"__s{j}").cast("double") / F.col(f"__n{j}").cast("double"),
                ).otherwise(overall)
                for j in range(n_resamples)
            ]
        )
    )
    lo_idx = max(1, round(n_resamples / 16))  # 2 at B=32
    hi_idx = n_resamples - lo_idx + 1  # 31 at B=32
    return per.select(
        *[F.col(c) for c in group_cols],
        "n",
        F.round(F.col("__sv").cast("double") / F.col("n").cast("double"), 6).alias(
            "mean"
        ),
        F.round(F.element_at(means, lo_idx), 6).alias("ci_lo"),
        F.round(F.element_at(means, hi_idx), 6).alias("ci_hi"),
    ).orderBy(*group_cols)


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    inv_rate: int = 64,
) -> DataFrame:
    """Sketch-based equi-join cardinality estimate vs exact — the
    optimizer-statistics quality audit (the CBO question "how big
    will this join be" answered by a coordinated key sample, cf.
    end-biased sampling, Estan & Naughton ICDE'06):

        S = { k : md5_60(k) < 2^60 / inv_rate }      (key-coordinated)
        est = inv_rate · Σ_{k∈S} f_L(k) · f_R(k)
        exact = Σ_k f_L(k) · f_R(k)     (computed WITHOUT the join)

    The hash sample is COORDINATED (same deterministic predicate on
    both sides), which is what makes Σ f_L·f_R estimable at all —
    independent per-side samples would almost never intersect on the
    join keys.  Unbiased over the hash family; this fixed seed gives
    ONE reproducible draw (the q157/q280 counter-based-RNG stance).

    Scale: two per-key count aggs + one key-frame join — the
    |keys|-sized frames, never the |join-output|-sized one; the
    exact side costs the same two aggs, so the audit is O(keys) even
    when the join itself would explode.  Returns ONE row
    (exact_rows, est_rows, sampled_keys, rel_err round 6)."""
    from ..functions.hashing import md5_int60

    thresh = (1 << 60) // int(inv_rate)
    fl = left.groupBy(F.col(left_key).alias("__k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__fl")
    )
    fr = right.groupBy(F.col(right_key).alias("__k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__fr")
    )
    prod = fl.join(fr, "__k").select(
        "__k",
        (F.col("__fl") * F.col("__fr")).cast("bigint").alias("__p"),
        (md5_int60(F.col("__k").cast("string")) < F.lit(thresh)).alias("__in"),
    )
    return prod.agg(
        F.sum(F.col("__p").cast("decimal(38,0)")).cast("bigint").alias("exact_rows"),
        (
            F.lit(int(inv_rate)).cast("bigint")
            * F.sum(F.when(F.col("__in"), F.col("__p")).otherwise(0)).cast("bigint")
        ).alias("est_rows"),
        F.sum(F.when(F.col("__in"), 1).otherwise(0)).cast("bigint").alias(
            "sampled_keys"
        ),
    ).select(
        "exact_rows",
        "est_rows",
        "sampled_keys",
        F.round(
            (F.col("est_rows").cast("double") - F.col("exact_rows").cast("double"))
            / F.col("exact_rows").cast("double"),
            6,
        ).alias("rel_err"),
    )


def mutual_information(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Mutual information between two categorical columns plus the
    asymmetric dependence readouts built on it (Cover & Thomas ch. 2;
    Theil's uncertainty coefficient, Theil 1970):

        MI      = H(X) + H(Y) − H(X,Y)                    (nats)
        NMI     = MI / sqrt(H(X)·H(Y))                    (symmetric)
        U(X|Y)  = MI / H(X),   U(Y|X) = MI / H(Y)         (directional)

    computed via the entropy identity so every Σ is a plain
    -(m/N)·ln(m/N) entropy over ONE counts frame (cells, X-marginal,
    Y-marginal) — three identical quantized sums, no per-cell joint/
    marginal ratio term.  A constant column has H = 0 and every
    normalized readout NULL-propagates (never 0/0).

    The feature-selection / leakage screen: U(label|feature) near 1
    flags a feature that memorizes the label (the q148 split-leakage
    concern expressed information-theoretically), where q164's χ²
    only flags non-independence without a [0,1] effect size.

    Determinism: cell/marginal counts are exact BIGINTs; each entropy
    and MI term is quantized to DECIMAL(28,12) before summing (the
    q292 dsum-of-logs rule) so the Σ is order-independent and
    engine-identical.  Scale: one groupBy to the |X|·|Y| cells frame;
    marginals and entropies are re-aggregations OF that metadata-sized
    frame — the input is scanned once.  Returns ONE row (n, h_x, h_y,
    h_xy, mi, nmi, u_x_given_y, u_y_given_x) round 6."""
    q12 = lambda c: c.cast("decimal(28,12)")  # noqa: E731

    # the cells frame feeds FOUR consumers (total + three entropies);
    # localCheckpoint pins it so the data scan runs ONCE, not once per
    # branch (Catalyst does not reuse the exchange across the
    # crossJoin assembly — 5 scans of a 100 TB table otherwise)
    cells = (
        df.groupBy(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
        .localCheckpoint(eager=False)
    )
    nt = cells.agg(F.sum("__n").cast("bigint").alias("__nt"))

    def entropy(marg: DataFrame, out: str) -> DataFrame:
        """H = Σ -(m/N)·ln(m/N) over a 1-col marginal counts frame —
        N arrives as a 1-row broadcast (q164 grand-total shape), so a
        high-cardinality marginal never funnels through one task."""
        m = marg.crossJoin(F.broadcast(nt))
        p = F.col("__m").cast("double") / F.col("__nt").cast("double")
        return m.select(q12(-p * F.log(p)).alias("__t")).agg(
            F.sum("__t").cast("double").alias(out)
        )

    hx = entropy(
        cells.groupBy("__x").agg(F.sum("__n").cast("bigint").alias("__m")),
        "__shx",
    )
    hy = entropy(
        cells.groupBy("__y").agg(F.sum("__n").cast("bigint").alias("__m")),
        "__shy",
    )
    hxy = entropy(cells.select(F.col("__n").alias("__m")), "__shxy")
    # MI = H(X) + H(Y) − H(X,Y): exact in the quantized-term algebra,
    # and the identity keeps every Σ a plain entropy over one frame
    agg = (
        nt.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(hxy))
    )
    mi = F.col("__shx") + F.col("__shy") - F.col("__shxy")
    # a constant column has H = 0: every normalized readout is then
    # 0/0 — NULL-propagate (the q286 degenerate-population contract)
    # instead of tripping ANSI divide-by-zero
    hx_pos = F.col("__shx") > 0
    hy_pos = F.col("__shy") > 0
    return agg.select(
        F.col("__nt").alias("n"),
        F.round(F.col("__shx"), 6).alias("h_x"),
        F.round(F.col("__shy"), 6).alias("h_y"),
        F.round(F.col("__shxy"), 6).alias("h_xy"),
        F.round(mi, 6).alias("mi"),
        F.round(
            F.when(
                hx_pos & hy_pos,
                mi / F.sqrt(F.col("__shx") * F.col("__shy")),
            ),
            6,
        ).alias("nmi"),
        F.round(F.when(hx_pos, mi / F.col("__shx")), 6).alias("u_x_given_y"),
        F.round(F.when(hy_pos, mi / F.col("__shy")), 6).alias("u_y_given_x"),
    )


def quantile_normalization(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    id_col: str,
    n_bins: int = 16,
) -> DataFrame:
    """Quantile normalization across groups (Bolstad et al.,
    Bioinformatics 2003 — the microarray method, here as the
    cross-source feature-calibration table): rank each group's values,
    cut each group's rank range into ``n_bins`` equal-count bins, and
    define the REFERENCE distribution as the across-group mean of the
    per-(group, bin) means.  Mapping a group's bin mean to the
    reference value removes per-group scale/shift so heterogeneous
    sources become comparable (the q224-PSI drift problem, but fixing
    the distributions instead of flagging them).

    Unequal group sizes are handled by the binning: row with 1-based
    rank r in a group of n lands in bin (r−1)·B div n — exact integer
    arithmetic, bins differ by at most one row.  Ranks are strict
    (ties broken by ``id_col``) via the two-phase ranker — no
    per-group single task.  Per-bin means are decimal-exact sums
    (dsum rule); the reference mean quantizes each group's bin mean to
    DECIMAL(28,12) before averaging.

    Contract: ``value_col`` and ``id_col`` must be non-NULL — the
    ranks sort on them, and Spark orders NULLS FIRST while the DuckDB
    oracle orders NULLS LAST, so a NULL would silently diverge the
    two rankings (round-9 ADVICE; the registered q298 data has none).

    Returns (group, bin, n_rows, group_mean, ref_value, delta =
    ref − group) round 6, ordered by (group, bin)."""
    from pyspark.sql import Window
    from .windows import grouped_rank_two_phase

    ranked = grouped_rank_two_phase(
        df.select(
            F.col(group_col).alias("__g"),
            F.col(value_col).alias("__v"),
            F.col(id_col).alias("__id"),
        ),
        ["__g"],
        ["__v", "__id"],
        out_col="__r",
        group_size_col="__n",
    )
    # exact BIGINT floor-division: (num − num mod n) / n divides
    # evenly, so the double division is exact (no float-floor edge)
    num = ((F.col("__r") - 1) * F.lit(int(n_bins))).cast("bigint")
    nn = F.col("__n").cast("bigint")
    b = (num - num % nn) / nn
    binned = ranked.select(
        "__g",
        "__v",
        b.cast("bigint").alias("__b"),
    )
    per = binned.groupBy("__g", "__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (dsum("__v", 6) / F.count(F.lit(1))).alias("__gm"),
    )
    q12 = lambda c: c.cast("decimal(28,12)")  # noqa: E731
    ref = F.sum(q12(F.col("__gm"))).over(Window.partitionBy("__b")).cast(
        "double"
    ) / F.count(F.lit(1)).over(Window.partitionBy("__b")).cast("double")
    return per.select(
        F.col("__g").alias("grp"),
        F.col("__b").alias("bin"),
        "n_rows",
        F.round(F.col("__gm"), 6).alias("group_mean"),
        F.round(ref, 6).alias("ref_value"),
        F.round(ref - F.col("__gm"), 6).alias("delta"),
    ).orderBy("grp", "bin")


def tail_dependence(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    id_col: str,
    quantiles: tuple[float, ...] = (0.9, 0.95, 0.99),
) -> DataFrame:
    """Empirical tail-dependence coefficients between two measures
    (the copula diagnostic, Joe 1997 §2.1.10): at each quantile q
    with k = floor(q·n),

        λ_U(q) = |{rx > k ∧ ry > k}| / (n − k)      (upper tail)
        λ_L(q) = |{rx ≤ n−k ∧ ry ≤ n−k}| / (n − k)  (lower tail)

    — the probability both measures are extreme TOGETHER, which
    correlation misses entirely (ρ is dominated by the bulk; risk
    and skew live in the joint tail — the q136-skew question asked
    jointly of two columns).

    Rank-based and integer-exact: strict ranks (ties broken by
    ``id_col``) from the two-phase ranker, thresholds and counts all
    BIGINT — the only division is the final ratio.  No distributional
    assumption, no float comparisons, bit-identical on any engine.
    Contract: ``x_col``/``y_col``/``id_col`` must be non-NULL — the
    ranks sort on them and Spark (NULLS FIRST) vs the DuckDB oracle
    (NULLS LAST) would silently diverge (round-9 ADVICE).
    Scale: two global ranks (range-exchange, no single task) + one
    id-equi-join + a 3-row broadcast.  Returns one row per q
    (q, n, k_thresh, n_upper_joint, lambda_upper, n_lower_joint,
    lambda_lower) round 6, ordered by q."""
    from .windows import grouped_rank_two_phase

    if not all(0.0 < q < 1.0 for q in quantiles):
        raise ValueError(
            f"quantiles must lie strictly inside (0, 1): {quantiles!r}"
            " — q = 1 empties the tail (division by n - k = 0)"
        )
    # dedupe: a repeated q would crossJoin two copies that collapse
    # into ONE groupBy('q') group, doubling the joint counts so
    # lambda can exceed 1 (round-9 ADVICE)
    quantiles = sorted({float(q) for q in quantiles})

    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).alias("__x"),
        F.col(y_col).alias("__y"),
    )
    rx = grouped_rank_two_phase(
        base.select("__id", "__x"), [], ["__x", "__id"], out_col="__rx",
        group_size_col="__n",
    ).select("__id", "__rx", "__n")
    ry = grouped_rank_two_phase(
        base.select("__id", "__y"), [], ["__y", "__id"], out_col="__ry"
    ).select("__id", "__ry")
    ranks = rx.join(ry, "__id")
    qf = df.sparkSession.createDataFrame(
        [(q,) for q in quantiles], "q double"
    )
    j = ranks.crossJoin(F.broadcast(qf))
    k = F.floor(F.col("q") * F.col("__n")).cast("bigint")
    upper = (F.col("__rx") > k) & (F.col("__ry") > k)
    lower = (F.col("__rx") <= F.col("__n") - k) & (
        F.col("__ry") <= F.col("__n") - k
    )
    out = j.groupBy("q").agg(
        F.max("__n").alias("n"),
        F.max(k).alias("k_thresh"),
        F.sum(F.when(upper, 1).otherwise(0)).cast("bigint").alias(
            "n_upper_joint"
        ),
        F.sum(F.when(lower, 1).otherwise(0)).cast("bigint").alias(
            "n_lower_joint"
        ),
    )
    tail_n = (F.col("n") - F.col("k_thresh")).cast("double")
    return out.select(
        "q",
        "n",
        "k_thresh",
        "n_upper_joint",
        F.round(F.col("n_upper_joint").cast("double") / tail_n, 6).alias(
            "lambda_upper"
        ),
        "n_lower_joint",
        F.round(F.col("n_lower_joint").cast("double") / tail_n, 6).alias(
            "lambda_lower"
        ),
    ).orderBy("q")


def jackknife_shard_variance(
    df: DataFrame,
    *,
    id_col: str,
    value_col: str,
    shards: int = 16,
    salt: str = "jack-v1",
) -> DataFrame:
    """Delete-one-shard jackknife (Quenouille 1956 / Tukey 1958, the
    delete-a-GROUP form) for the corpus mean of ``value_col``: shard
    rows by the engine-stable md5 key (the q185 shuffle idiom), form
    the g leave-one-shard-out means

        m_i = (S - s_i) / (N - n_i)

    and report  var_jack = (g-1)/g · sum_i (m_i - m̄)²  with m̄ the
    mean of the m_i — the distributed-systems answer to "what is the
    sampling error of this corpus statistic" that needs NO resampling
    passes (q280's Poisson bootstrap re-reads the data 64 ways; the
    jackknife reuses the per-shard partials one aggregation already
    produced).

    Determinism: per-shard (n_i, s_i) are exact BIGINT/DECIMAL
    partials; each m_i is one correctly-rounded division of exact
    values (bit-identical cross-engine — the q308 discipline); the
    16-row mean/variance reductions quantize every double to
    DECIMAL(28,12) before the exact decimal sum (order-independence —
    the dsum rule), with the variance terms squared on deterministic
    doubles under a fixed parenthesization.  Outputs round 6.
    Scale: ONE data pass (the per-shard aggregation); everything
    after runs on the g-row metadata frame.  Returns one row
    (g, n_rows, mean, var_jack, se_jack)."""
    from ..functions.hashing import md5_int60

    key = md5_int60(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    )
    per = (
        df.select(
            (key % F.lit(shards)).alias("__shard"),
            F.col(value_col).cast("decimal(27,6)").alias("__v"),
        )
        .groupBy("__shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__n"),
            F.sum("__v").cast("decimal(38,6)").alias("__s"),
        )
    )
    tot = per.agg(
        F.sum("__n").cast("bigint").alias("__nn"),
        F.sum("__s").cast("decimal(38,6)").alias("__ss"),
        F.count(F.lit(1)).cast("bigint").alias("__g"),
    )
    loo = per.crossJoin(F.broadcast(tot)).select(
        "__nn",
        "__ss",
        "__g",
        (
            (F.col("__ss") - F.col("__s")).cast("double")
            / (F.col("__nn") - F.col("__n")).cast("double")
        ).alias("__m"),
    )
    mbar_frame = loo.groupBy("__nn", "__ss", "__g").agg(
        F.sum(F.col("__m").cast("decimal(28,12)")).alias("__m_sum")
    ).select(
        "__nn",
        "__ss",
        "__g",
        (
            F.col("__m_sum").cast("double") / F.col("__g").cast("double")
        ).alias("__mbar"),
    )
    terms = loo.join(F.broadcast(mbar_frame), ["__nn", "__ss", "__g"]).select(
        "__nn",
        "__ss",
        "__g",
        "__mbar",
        (
            (F.col("__m") - F.col("__mbar")) * (F.col("__m") - F.col("__mbar"))
        )
        .cast("decimal(28,12)")
        .alias("__t"),
    )
    out = terms.groupBy("__nn", "__ss", "__g").agg(
        F.sum("__t").alias("__t_sum")
    )
    var_jack = (
        (F.col("__g") - 1).cast("double")
        / F.col("__g").cast("double")
        * F.col("__t_sum").cast("double")
    )
    return out.select(
        F.col("__g").alias("g"),
        F.col("__nn").alias("n_rows"),
        F.round(
            F.col("__ss").cast("double") / F.col("__nn").cast("double"), 6
        ).alias("mean"),
        F.round(var_jack, 6).alias("var_jack"),
        F.round(F.sqrt(var_jack), 6).alias("se_jack"),
    )
