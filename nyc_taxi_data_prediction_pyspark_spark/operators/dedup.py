"""Deduplication operators (SURVEY.md §2.10 M4 + north-star set).

The reference's only dedup is the MERGE-on-composite-key load
(reference: dags/etl_spark_historical.py:303-333) — exact-key dedup.
A training-data pipeline needs the near-duplicate family too:

- ``exact_dedup``          hash-groupBy on content (or fingerprint)
- ``ngram_jaccard_pairs``  exact shingle-set Jaccard via explode +
                           self-join on shingle (inverted index), no
                           O(n²) cross join
- ``minhash_lsh_pairs``    MinHashLSH (MLlib) approximate Jaccard —
                           the 100 TB scale path
- ``simhash``              64-bit SimHash signature per doc + banded
                           candidate pairing
- ``embedding_dupes``      cosine near-dup over embedding vectors

Scale notes per operator are inline. The exact Jaccard join is
quadratic only within a posting list (docs sharing a shingle), which
is the standard inverted-index bound; MinHash/SimHash replace it with
constant-factor banding at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import normalize_text


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the min-id row per content group (hash
    aggregate — one shuffle on the content hash). Deterministic
    winner, unlike dropDuplicates' arbitrary first-seen row."""
    return (
        df.groupBy(*content_cols)
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


def word_shingles(df: DataFrame, *, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle). Built-ins
    only: split → transform over index range → explode → distinct."""
    toks = F.split(normalize_text(text_col), " ")
    n_sh = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    sh = F.transform(
        F.sequence(F.lit(0), n_sh - 1),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]),
    )
    return (
        df.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .where(F.size(toks) >= n)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, *, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted index:

    shingles → self-join on shingle (only docs sharing ≥1 shingle are
    compared) → |A∩B| per pair → Jaccard with |A|+|B|. One shuffle on
    shingle + one on the pair key. At 100 TB, cap posting-list length
    (drop ultra-common shingles) before the join — the ``max_df``
    parameter of the scale variant (minhash_lsh_pairs) does this
    implicitly via banding.
    """
    sh = word_shingles(df, text_col=text_col, id_col=id_col, n=n).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hash_tables: int = 8,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Approximate Jaccard near-dup via MLlib MinHashLSH — the scale
    path: shingle → HashingTF sparse vector → minhash signatures →
    banded bucket join (approxSimilarityJoin). Cost is O(n · tables)
    plus bucket-local joins, never all-pairs.

    Returns (id_a, id_b, jaccard_dist_est) with id_a < id_b.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = word_shingles(df, text_col=text_col, id_col=id_col, n=n)
    docs = sh.groupBy(id_col).agg(F.collect_list("shingle").alias("shingles"))
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True)
    feat = tf.transform(docs)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    model = mh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 1.0 - jaccard_threshold, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
        .where(F.col("id_a") < F.col("id_b"))
    )


def simhash(
    df: DataFrame, *, text_col: str, id_col: str, bits: int = 64
) -> DataFrame:
    """64-bit SimHash signature per document, built-ins only.

    Each token hashes to 64 bits (xxhash64); per bit position the doc
    sums ±1 over tokens; sign of the sum is the signature bit. All via
    explode + groupBy — one shuffle, no UDF. Signatures are
    engine-specific (xxhash64 seed) → no SQL oracle; paired with a
    pytest property (hamming(simhash(x), simhash(x + small edit)) small).
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(normalize_text(text_col), " ")).alias("tok")
    )
    h = toks.withColumn("h", F.xxhash64("tok"))
    one = F.lit(1).cast("bigint")
    contrib = h.select(
        id_col,
        *[
            (
                F.when(F.col("h").bitwiseAND(F.shiftleft(one, b)) != 0, F.lit(1)).otherwise(F.lit(-1))
            ).alias(f"b{b}")
            for b in range(bits)
        ],
    )
    sums = contrib.groupBy(id_col).agg(*[F.sum(f"b{b}").alias(f"b{b}") for b in range(bits)])
    sig = F.lit(0).cast("bigint")
    for b in range(bits - 1):  # top bit left 0 to stay in signed range
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0))
    return sums.select(F.col(id_col), sig.alias("simhash"))


def hamming64(a, b):
    """Popcount of XOR via bit_count (built-in)."""
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))


def embedding_dupes(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs. Blocked self-join (same
    ``block_col``) keeps the candidate set linear-ish; at 100 TB the
    block key comes from LSH bucketing (similarity.lsh_buckets) instead
    of a label column. Cosine is built-in fold math (functions.vectors).
    """
    from ..functions.vectors import as_double, cosine

    e = emb.select(
        F.col(id_col), as_double(vec_col).alias("v"), *( [F.col(block_col)] if block_col else [] )
    )
    a = e.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), *( [F.col(block_col)] if block_col else [] ))
    b = e.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), *( [F.col(block_col)] if block_col else [] ))
    on = [block_col] if block_col else None
    joined = a.join(b, on=on) if on else a.crossJoin(b)
    return (
        joined.where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
