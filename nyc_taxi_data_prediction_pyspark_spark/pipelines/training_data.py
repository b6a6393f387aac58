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
