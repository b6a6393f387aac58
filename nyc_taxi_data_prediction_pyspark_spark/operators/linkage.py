"""Record linkage / entity resolution: blocked fuzzy matching of a
dirty record set against a clean registry — the string-similarity
sibling of the dedup family (operators/dedup.py handles content/
embedding near-dups; this handles ENTITY near-dups, the master-data
problem every warehouse ingest has).

Reference parity: the reference's MERGE matches on exact equality of
a 6-column key (etl_spark_historical.py:304-313) — a single corrupted
character orphans the row. Linkage closes that gap: candidate
generation by BLOCKING (equi-join on coarse keys), a cheap length
prefilter, exact Levenshtein on the survivors, best match per dirty
record by (distance, id) — fully deterministic, so a SQL oracle can
replay it.

Scale posture (10^9-row registry):
- candidates come from an EQUI join on the block keys — never an
  all-pairs comparison; block key choice bounds the candidate count
  (#dirty_in_block × #clean_in_block per block);
- the |len(a) - len(b)| <= max_distance prefilter is a codegen-stage
  residual that drops size-incompatible pairs BEFORE the O(len²)
  Levenshtein evaluates — the same prune q17 applies to shingle sets;
- best-match selection is min(struct(dist, id)) per dirty id — one
  map-side-combinable aggregation, no window sort;
- skewed blocks (one nation = half the registry) go through the same
  remedies as any hot equi-join: composite block keys, salting
  (operators/skew.py), or AQE skew splitting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def link_records(
    dirty: DataFrame,
    clean: DataFrame,
    *,
    block_keys: Sequence[str],
    dirty_id: str,
    clean_id: str,
    dirty_text: str,
    clean_text: str,
    max_distance: int = 2,
) -> DataFrame:
    """Best fuzzy match per dirty record: equi-join on ``block_keys``,
    length prefilter, ``levenshtein <= max_distance``, winner by
    (distance, clean id). Returns one row per MATCHED dirty record:
    (block_keys…, dirty_id, matched_id, dist). Unmatched dirty rows
    are absent (left-join semantics belong to the caller, who knows
    what an orphan means for their pipeline)."""
    keys = list(block_keys)
    d = dirty.select(
        *keys,
        F.col(dirty_id).alias("__did"),
        F.col(dirty_text).alias("__dtxt"),
    )
    c = clean.select(
        *keys,
        F.col(clean_id).alias("__cid"),
        F.col(clean_text).alias("__ctxt"),
    )
    cand = (
        d.join(c, keys)
        .where(
            F.abs(F.length("__dtxt") - F.length("__ctxt")) <= F.lit(max_distance)
        )
        # 3-arg BANDED levenshtein: O(len·k) with early exit instead of
        # the O(len²) full DP — returns -1 past the threshold, which the
        # filter drops. Same survivors as the unbounded form; the per-
        # pair constant is what the block-sized candidate volume pays.
        .withColumn("__dist", F.levenshtein("__dtxt", "__ctxt", max_distance))
        .where((F.col("__dist") >= 0) & (F.col("__dist") <= F.lit(max_distance)))
    )
    best = (
        cand.groupBy(*keys, "__did")
        .agg(F.min(F.struct("__dist", "__cid")).alias("__m"))
        .select(
            *keys,
            F.col("__did").alias(dirty_id),
            F.col("__m.__cid").alias("matched_id"),
            F.col("__m.__dist").alias("dist"),
        )
    )
    return best


def link_records_multiblock(
    dirty: DataFrame,
    clean: DataFrame,
    *,
    block_key_sets: Sequence[Sequence[str]],
    dirty_id: str,
    clean_id: str,
    dirty_text: str,
    clean_text: str,
    max_distance: int = 2,
) -> DataFrame:
    """Multi-pass blocking — the standard ER recall fix: a single
    blocking key misses every true match whose corrupted field IS the
    blocking key, so candidates are generated under SEVERAL
    independent blockings and unioned before best-match selection.

    Each pass is the same equi-join + banded-levenshtein pipeline as
    :func:`link_records`; the union is deduplicated by
    (dirty_id, clean_id) via the min-distance aggregate that picks the
    winner anyway, so no extra distinct shuffle. Recall grows with
    each pass while cost stays Σ per-pass candidate volumes —
    at 100 TB you budget passes exactly like secondary indexes.

    Returns one row per matched dirty record:
    (dirty_id, matched_id, dist) — block keys are pass-specific and
    therefore not part of the output contract."""
    if not block_key_sets:
        raise ValueError("block_key_sets must be non-empty")
    per_pass = []
    for keys in block_key_sets:
        p = link_records(
            dirty,
            clean,
            block_keys=list(keys),
            dirty_id=dirty_id,
            clean_id=clean_id,
            dirty_text=dirty_text,
            clean_text=clean_text,
            max_distance=max_distance,
        ).select(dirty_id, "matched_id", "dist")
        per_pass.append(p)
    allc = per_pass[0]
    for p in per_pass[1:]:
        allc = allc.unionByName(p)
    return (
        allc.groupBy(dirty_id)
        .agg(F.min(F.struct("dist", "matched_id")).alias("__m"))
        .select(
            dirty_id,
            F.col("__m.matched_id").alias("matched_id"),
            F.col("__m.dist").alias("dist"),
        )
    )


def deletion_neighborhood_pairs(
    df: DataFrame,
    *,
    id_col: str,
    name_col: str,
) -> DataFrame:
    """Edit-distance-1 pair discovery via SymSpell-style DELETION
    NEIGHBORHOODS (Garbe's symmetric-delete indexing): each string
    posts itself plus its |w| single-deletion variants; two strings
    within Levenshtein 1 are GUARANTEED to share a posting (deletion:
    del(a)=b; insertion: a=del(b); substitution: del(a)=del(b) at the
    differing position), so one variant equi-join is a complete
    candidate generator — no quadratic name cross-join, no banded
    scan. Candidates verify with the exact levenshtein filter.

    Scale: postings are |rows| x (len+1); the join keys on the variant
    string (hot variants are bounded by how many strings share a
    near-identical form — the data's own dup structure); verification
    is in-row codegen. Returns distinct (id_a < id_b) pairs with both
    names.
    """
    base = df.select(F.col(id_col).alias("__id"), F.col(name_col).alias("__nm"))
    # variants travel as xxhash64 bigints, not strings (the q17 hashed-
    # shingle discipline — round 13): the self-join shuffles a fixed
    # 8-byte key instead of a ~|name|-byte string. A hash collision can
    # only ADD a candidate pair, and every candidate is verified by the
    # exact levenshtein filter below, so the result set is unchanged
    # (completeness: true lev<=1 pairs share a REAL variant, hence its
    # hash).
    variants = base.select(
        "__id",
        "__nm",
        F.explode(
            F.concat(
                F.array(F.col("__nm")),
                F.transform(
                    F.sequence(F.lit(1), F.length("__nm")),
                    lambda i: F.concat(
                        F.substring(F.col("__nm"), F.lit(1), i - 1),
                        F.col("__nm").substr(i + 1, F.length("__nm")),
                    ),
                ),
            )
        ).alias("__var0"),
    ).select("__id", "__nm", F.xxhash64("__var0").alias("__var"))
    a = variants.alias("a")
    b = variants.alias("b")
    cand = (
        a.join(b, "__var")
        .where(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__nm").alias("name_a"),
            F.col("b.__nm").alias("name_b"),
        )
        .distinct()
    )
    return cand.where(F.levenshtein("name_a", "name_b") <= 1)
