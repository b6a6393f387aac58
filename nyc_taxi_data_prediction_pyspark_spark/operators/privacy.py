"""Privacy / re-identification-risk operators (north-star extension:
the release gates a training-data pipeline runs before corpus export —
reference parity anchor: the reference's readme verification
aggregates over customer-grained tables, readme.md:139-190, extended
to the privacy-audit readouts that decide whether those tables may
leave the warehouse at all).

Two families:
  * k-anonymity / l-diversity audit (Samarati & Sweeney 1998;
    Machanavajjhala et al. ICDE'06): how small is the smallest
    quasi-identifier equivalence class, and how little does the
    sensitive attribute vary inside classes — the standard tabular
    re-identification readout.
  * regex PII redaction: the scrub transform itself (emails, card-like
    digit runs, phone-shaped numbers), counts per category plus a
    checksum of the redacted text so the oracle can verify the exact
    rewritten bytes, not just the counts.

Determinism contract: class sizes, class counts and l-diversity minima
are exact BIGINTs; the only IEEE operation is the final share division.
Redaction is pure string algebra (regexp_replace/extract_all) with
identical RE2-compatible patterns on both engines.

Scale shape: the audit is two map-side-combinable aggregations
(rows -> classes -> histogram) plus one 1-row total broadcast; no
window, no self-join. Redaction is a narrow per-row projection —
no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# RE2-compatible AND Java-regex-compatible patterns (no lookarounds,
# no backrefs) so Spark and the DuckDB oracle scrub identical spans.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
CARD_RE = "[0-9]{13,19}"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def k_anonymity_audit(
    df: DataFrame,
    *,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int,
) -> DataFrame:
    """k-anonymity / l-diversity audit over the quasi-identifier
    combination ``quasi_cols``: every row whose quasi-identifier
    equivalence class holds fewer than ``k`` rows is re-identifiable
    at confidence 1/class_size; distinct-l-diversity (Machanavajjhala
    et al. ICDE'06) additionally requires each class to contain >= l
    distinct sensitive values, else the sensitive attribute leaks even
    without row re-identification.

    Returns the class-size histogram — one row per observed class
    size: (class_size, n_classes, n_rows, min_l_diversity,
    violates_k, row_share) — the release-gate readout (the full
    per-class frame is an intermediate; the histogram is what a
    governance dashboard keys on). ``row_share`` is the single IEEE
    division; everything else is exact BIGINT.

    Plan: rows -> classes (groupBy quasi, count + countDistinct
    sensitive) -> histogram (groupBy class_size) -> broadcast 1-row
    total for the share. Both aggregations map-side combine; the
    class frame is bounded by the quasi-identifier domain, never
    carried to the driver."""
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size"),
        F.countDistinct(sensitive_col).cast("bigint").alias("l_div"),
    )
    hist = classes.groupBy("class_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("class_size").cast("bigint").alias("n_rows"),
        F.min("l_div").alias("min_l_diversity"),
    )
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("__total"))
    return hist.crossJoin(F.broadcast(total)).select(
        "class_size",
        "n_classes",
        "n_rows",
        "min_l_diversity",
        (F.col("class_size") < F.lit(int(k))).alias("violates_k"),
        (F.col("n_rows").cast("double") / F.col("__total").cast("double")).alias(
            "row_share"
        ),
    )


def redact_pii(
    df: DataFrame,
    *,
    text_col: str,
) -> DataFrame:
    """Regex PII scrub: replace emails, card-like digit runs (13-19
    digits) and phone-shaped numbers (NNN-NNN-NNNN) with typed mask
    tokens, and count each category BEFORE rewriting (counts refer to
    the original text).

    Order matters and is part of the contract: emails first (their
    local/domain parts may contain digits a later pass would mangle),
    then phone shapes (dash-delimited, so the card pass cannot consume
    them), then bare card runs. Counting uses the SAME patterns on the
    ORIGINAL text, so a span consumed by an earlier rewrite still
    counts in its own category. Caveat: counts may OVERLAP — an email
    whose local part embeds a 13+ digit run counts as both an email
    and a card occurrence (the rewrite itself scrubs it exactly once,
    as an email); phone shapes never overlap cards (dashes) and card
    runs of 20+ digits match greedily 19 at a time.

    Pure projection — no shuffle; patterns are RE2-and-Java compatible
    so the DuckDB oracle rewrites identical bytes. Returns the input
    columns minus ``text_col`` plus (n_email, n_phone, n_card,
    redacted_len, redacted_md5)."""
    t = F.col(text_col)
    red = F.regexp_replace(t, EMAIL_RE, "[EMAIL]")
    red = F.regexp_replace(red, PHONE_RE, "[PHONE]")
    red = F.regexp_replace(red, CARD_RE, "[CARD]")
    keep = [c for c in df.columns if c != text_col]
    return df.select(
        *keep,
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_email"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phone"),
        F.size(F.regexp_extract_all(t, F.lit(CARD_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_card"),
        F.length(red).cast("bigint").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


def t_closeness_audit(
    df: DataFrame,
    *,
    quasi_cols: list[str],
    sensitive_col: str,
    t_num: int,
    t_den: int,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian ICDE'07) over an
    ORDERED sensitive attribute: a quasi-identifier equivalence class
    violates t-closeness when the Earth Mover's Distance between its
    sensitive-value distribution and the global one exceeds t — the
    release gate k-anonymity/l-diversity (q254) miss: a class can be
    large and diverse yet still skew the sensitive attribute enough to
    leak (every value present, but the mix is off).

    For an ordered discrete domain v_1 < … < v_m the EMD is the mean
    absolute cumulative-share gap:

        EMD = ( Σ_i |P_cum(i) − Q_cum(i)| ) / (m − 1)

    Determinism: both cumulative shares are rationals with fixed
    denominators (class size n_c, global N), so each gap numerator
    |c_cum·N − g_cum·n_c| is an exact BIGINT (products < 2^63 for
    n_c·N below ~9e18; DECIMAL(38,0) beyond) and the violation flag is
    decided by the cross-multiplied integer comparison

        t_den · Σ|…|  >  t_num · n_c · N · (m−1)

    — no float ever gates the decision. The reported ``emd`` is one
    IEEE division, round 6, display-only.

    Scale shape: rows → (class × sensitive-value) counts (one
    combinable groupBy), zero-filled on the class × domain grid (a
    broadcast cross join of two metadata-sized frames — the
    kendall_tau_b grid rule), one cumulative window over the grid,
    one 1-row global broadcast. Nothing data-sized after the first
    aggregation; quantize continuous sensitive attributes first.

    Returns one row per class: quasi_cols + (n_class, emd,
    violates_t), ordered by quasi_cols.
    """
    from pyspark.sql import Window as W

    qk = list(quasi_cols)
    s = F.col(sensitive_col)
    cells = (
        df.where(s.isNotNull())
        .groupBy(*qk, s.alias("__sv"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    classes = cells.groupBy(*qk).agg(F.sum("__c").cast("bigint").alias("__nc"))
    domain = cells.groupBy("__sv").agg(F.sum("__c").cast("bigint").alias("__g"))
    glob = domain.agg(F.sum("__g").cast("bigint").alias("__N"))
    grid = classes.crossJoin(F.broadcast(domain)).join(
        cells, [*qk, "__sv"], "left"
    ).select(
        *qk,
        "__sv",
        "__nc",
        "__g",
        F.coalesce(F.col("__c"), F.lit(0)).cast("bigint").alias("__c"),
    )
    w_cum = (
        W.partitionBy(*qk)
        .orderBy("__sv")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = grid.select(
        *qk,
        "__nc",
        F.sum("__c").over(w_cum).alias("__ccum"),
        F.sum("__g").over(w_cum).alias("__gcum"),
    )
    per_class = (
        cum.crossJoin(F.broadcast(glob))
        .groupBy(*qk)
        .agg(
            F.max("__nc").alias("n_class"),
            F.sum(
                F.abs(F.col("__ccum") * F.col("__N") - F.col("__gcum") * F.col("__nc"))
            )
            .cast("bigint")
            .alias("__num"),
            F.max("__N").alias("__Nv"),
            (F.count(F.lit(1)) - F.lit(1)).cast("bigint").alias("__m1"),
        )
    )
    # the last grid row always has ccum*N == gcum*nc (both equal nc*N),
    # so summing over all m rows equals summing over the m-1 steps.
    return per_class.select(
        *qk,
        "n_class",
        F.round(
            F.col("__num").cast("double")
            / (F.col("n_class") * F.col("__Nv") * F.col("__m1")).cast("double"),
            6,
        ).alias("emd"),
        (
            F.lit(int(t_den)) * F.col("__num")
            > F.lit(int(t_num)) * F.col("n_class") * F.col("__Nv") * F.col("__m1")
        ).alias("violates_t"),
    ).orderBy(*qk)
