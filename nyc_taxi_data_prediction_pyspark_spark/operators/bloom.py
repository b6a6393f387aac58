"""Bloom-filter semi-join pruning (sideways information passing) as an
explicit, fully distributed operator — no driver-side filter object.

At 100 TB the dominant cost of `fact SEMI JOIN small_keys` is shuffling
the fact side; Catalyst's own runtime bloom filter
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects this rewrite
when statistics allow. This operator makes the technique first-class and
predictable: build a bitmap from the key set with engine-stable hashing,
pre-filter the fact on the bitmap (cheap broadcast probes, no shuffle of
dropped rows), THEN run the exact semi join on the survivors. Bloom
false positives are removed by the exact join, so the result is
IDENTICAL to the plain semi join — the filter only changes how many
rows reach the shuffle (oracle-checkable, q117).

Representation: m bits as ceil(m/64) BIGINT words in a tiny DataFrame
(word_idx, word). Build = one aggregation over the key set
(`bit_or` of `1 << bit`); probe = k broadcast equi-joins of the fact's
(word_idx, bit) pairs against that words frame — word count is
m/64 rows (KBs for m = 2^16), so the probes never shuffle the fact.
Hashing is `xxhash64(key, seed)` — deterministic across runs/engines'
sessions, so the prune decision is reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _positions(key: Column, n_hashes: int, m_bits: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits)).cast("bigint")
        for seed in range(n_hashes)
    ]


def bloom_build(keys: DataFrame, key_col: str, *, n_hashes: int = 3, m_bits: int = 1 << 16) -> DataFrame:
    """Aggregate the key set into (word_idx, word) bitmap rows —
    one shuffle over the (small) key set, output is m_bits/64 rows."""
    pos = F.explode(F.array(*_positions(F.col(key_col), n_hashes, m_bits))).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.expr("pos div 64").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_prefilter(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    *,
    n_hashes: int = 3,
    m_bits: int = 1 << 16,
) -> DataFrame:
    """Keep fact rows whose key hits ALL n_hashes bloom positions.
    Each probe is a broadcast join against the words frame; a row drops
    at the first missing word (inner joins), so pruned rows never reach
    any downstream shuffle. May keep false positives — ALWAYS follow
    with the exact join; never use the bloom alone for semantics."""
    out = fact
    for seed in range(n_hashes):
        pos = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(m_bits)).cast("bigint")
        probe = bloom.select(
            F.col("word_idx").alias(f"__w{seed}"), F.col("word").alias(f"__word{seed}")
        )
        out = (
            out.withColumn(f"__p{seed}", pos)
            .join(
                F.broadcast(probe),
                F.expr(f"__p{seed} div 64") == F.col(f"__w{seed}"),
            )
            .where(
                F.expr(f"__word{seed} & shiftleft(CAST(1 AS BIGINT), CAST(__p{seed} % 64 AS INT))") != 0
            )
            .drop(f"__p{seed}", f"__w{seed}", f"__word{seed}")
        )
    return out


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    on: Sequence[str],
    *,
    n_hashes: int = 3,
    m_bits: int = 1 << 16,
) -> DataFrame:
    """Exact left-semi join with a bloom pre-filter: bitmap from the
    key side, prune the fact before its shuffle, exact semi join on the
    survivors. Result ≡ ``fact.join(keys, on, "left_semi")`` — the
    bloom affects only bytes shuffled (false-positive survivors are
    removed by the exact join). Single-column keys only (compose a
    struct/concat upstream for compound keys)."""
    (k,) = list(on)
    bloom = bloom_build(keys.select(k).distinct(), k, n_hashes=n_hashes, m_bits=m_bits)
    pruned = bloom_prefilter(fact, bloom, k, n_hashes=n_hashes, m_bits=m_bits)
    return pruned.join(keys.select(k).distinct(), on=[k], how="left_semi")
