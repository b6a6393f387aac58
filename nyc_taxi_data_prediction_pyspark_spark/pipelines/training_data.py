"""End-to-end LLM training-data pipeline (the north-star composition:
SURVEY.md §2.10 M2-M5 chained).

    documents
      → near-dup dedup        (native MinHash banding → connected
                               components → keep min-id per cluster)
      → chunking              (fixed token windows with overlap)
      → quality gate          (drop sub-minimum chunks)
      → token budgeting       (BPE-ish piece counts)
      → sequence packing      (contiguous pack id / offset)

Every stage is an already-oracle-verified operator (q55, q41, q75,
q76); this module is the composition a user actually runs, and the
integration test pins its invariants + determinism end-to-end.

Scale posture: dedup is banded (never all-pairs), chunking/budgeting
are narrow maps, packing is a prefix sum (two-phase at scale). The
only driver-side values are the connected-components convergence
flags. No stage collects data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load
from ..operators import dedup, text as textops

# chunk_key = doc_id * CHUNK_STRIDE + chunk_id: one orderable bigint
# per chunk for deterministic packing order (chunk_id < CHUNK_STRIDE
# is guaranteed by the chunker for any document under ~6M tokens)
CHUNK_STRIDE = 100_000


def build_training_set(
    spark: SparkSession,
    sf_dir: str,
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
    min_chunk_tokens: int = 8,
    seq_len: int = 512,
    jaccard_threshold: float = 0.3,
) -> DataFrame:
    """Returns (doc_id, chunk_id, chunk_key, chunk_text, n_tokens,
    pack_id, pack_offset) — deduplicated, chunked, quality-gated,
    packed. Deterministic for fixed inputs and knobs."""
    docs = load(spark, sf_dir, "documents")

    pairs = dedup.minhash_native_pairs(
        docs, text_col="text", id_col="doc_id",
        n=3, k=16, bands=4, jaccard_threshold=jaccard_threshold, seed=42,
    )
    kept = dedup.dedup_keep_one(docs, pairs.select("id_a", "id_b"), id_col="doc_id")

    chunks = textops.chunk_documents(
        kept, chunk_tokens=chunk_tokens, overlap=overlap
    ).where(F.col("n_chunk_tokens") >= min_chunk_tokens)

    budgeted = chunks.select(
        "doc_id",
        "chunk_id",
        (F.col("doc_id") * CHUNK_STRIDE + F.col("chunk_id")).alias("chunk_key"),
        "chunk_text",
        textops.token_count_bpe("chunk_text").alias("n_tokens"),
    )

    packed = textops.pack_documents(
        budgeted, id_col="chunk_key", tokens_col="n_tokens", seq_len=seq_len
    )
    return budgeted.join(packed.select("chunk_key", "pack_id", "pack_offset"), "chunk_key")


def with_shards(training: DataFrame, *, packs_per_shard: int = 64) -> DataFrame:
    """Assign each packed chunk to a training shard: shard_id =
    floor(pack_id / packs_per_shard). Contiguous packs share a shard,
    so a data loader reads one shard file sequentially — the layout
    every large-scale training job expects."""
    return training.withColumn(
        "shard_id",
        F.floor(F.col("pack_id") / packs_per_shard).cast("bigint"),
    )


def shard_manifest(training_with_shards: DataFrame) -> DataFrame:
    """Per-shard manifest (the sidecar metadata a loader uses to plan
    epochs without opening data files): chunk/token counts and the
    pack range. One aggregation on shard_id — tiny output."""
    return (
        training_with_shards.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.col("n_tokens").cast("bigint")).alias("n_tokens"),
            F.min("pack_id").alias("first_pack"),
            F.max("pack_id").alias("last_pack"),
        )
        .orderBy("shard_id")
    )


def write_training_shards(
    training: DataFrame, path: str, *, packs_per_shard: int = 64
) -> DataFrame:
    """Materialize the training set hive-partitioned by shard_id,
    sorted by (pack_id, pack_offset) within each file so a shard reads
    back in pack order with zero post-sorting. Partitioned layout =
    a loader can open exactly the shards of its data-parallel rank
    (partition pruning), and shard counts rebalance by repartitioning
    on shard_id first (one shuffle, then parallel writes). Returns the
    manifest of what was written."""
    sharded = with_shards(training, packs_per_shard=packs_per_shard)
    (
        sharded.repartition(F.col("shard_id"))
        .sortWithinPartitions("pack_id", "pack_offset")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    return shard_manifest(sharded)
