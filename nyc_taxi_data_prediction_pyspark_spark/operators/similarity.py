"""Similarity search over embedding columns (SURVEY.md §2.10 M3).

- ``cosine_topk``    brute-force exact top-k: one scan + TakeOrdered —
                     the correctness baseline, O(n·d), no shuffle.
- ``ivf_topk``       IVF-style two-stage ANN: k-means centroids →
                     route query to nprobe nearest cells → exact scan
                     inside cells. The 100 TB path: the table is
                     pre-partitioned by cell id, so a query touches
                     nprobe partitions instead of all splits.
- ``lsh_buckets`` /  random-hyperplane (sign) LSH bucketing for
  ``lsh_topk``       cosine — deterministic seeded projections,
                     bucket-local candidate scan.

Vector math is built-in fold expressions (functions/vectors.py), not
UDFs; the per-query vector is a literal array baked into the plan, so
Catalyst broadcasts it for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import as_double, cosine, dot


def _query_lit(qvec: list[float]):
    return F.array(*[F.lit(float(x)) for x in qvec])


def cosine_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine. orderBy+limit compiles to
    TakeOrderedAndProject: per-partition heap, only k rows shuffle."""
    q = _query_lit(qvec)
    return (
        emb.select(F.col(id_col), F.round(cosine(as_double(vec_col), q), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def kmeans_centroids(
    emb: DataFrame, n_cells: int, *, vec_col: str = "embedding", seed: int = 42, max_iter: int = 5
) -> list[list[float]]:
    """Driver-side tiny k-means (MLlib) to build the IVF coarse
    quantizer. Centroid count is O(√n) — small enough to broadcast."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(array_to_vector(as_double(vec_col)).alias("features"))
    km = KMeans(k=n_cells, seed=seed, maxIter=max_iter)
    model = km.fit(vecs)
    return [list(map(float, c)) for c in model.clusterCenters()]


def assign_cells(
    emb: DataFrame, centroids: list[list[float]], *, vec_col: str = "embedding"
) -> DataFrame:
    """Attach ``cell`` = argmax-cosine centroid id, built-ins only:
    build an array of centroid similarities and take array_position of
    the max. At write time, ``partitionBy('cell')`` makes cell routing
    a partition-pruned read."""
    v = as_double(vec_col)
    sims = F.array(*[dot(v, _query_lit(c)) for c in centroids])
    best = F.array_position(sims, F.array_max(sims)) - 1
    return emb.withColumn("cell", best.cast("int"))


def ivf_topk(
    emb_with_cells: DataFrame,
    centroids: list[list[float]],
    qvec: list[float],
    k: int = 10,
    nprobe: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: pick nprobe closest centroids driver-side (tiny),
    scan only those cells, exact rank within."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    order = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i], qvec))
    probe = order[:nprobe]
    return cosine_topk(
        emb_with_cells.where(F.col("cell").isin(probe)), qvec, k, id_col=id_col, vec_col=vec_col
    )


def auto_similarity_join(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cosine_threshold: float = 0.95,
    exact_limit: int = 10_000,
    n_planes: int = 8,
    repetitions: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Adaptive similarity self-join — the logical-level form of the
    optional Catalyst rewrite SURVEY.md §4 describes (a Python-side
    planner decision rather than a custom rule, which would need Scala):

    - row count ≤ ``exact_limit`` → exact blocked-by-nothing pairwise
      cosine (correct, O(n²) but small);
    - larger → OR-amplified sign-LSH: ``repetitions`` independent
      bucketings (different seeds), pairs unioned. Single-probe bucket
      recall at cos 0.95 with 8 planes is only ≈0.43; amplification
      lifts it to 1-(1-0.43)^r ≈ 0.89 at r=4 while candidate volume
      stays linear-ish per repetition.

    The count used for the decision is a cheap metadata-backed action.
    Returns (id_a, id_b, cos) either way.
    """
    from .dedup import embedding_dupes, embedding_dupes_lsh

    n = emb.count()
    if n <= exact_limit:
        return embedding_dupes(
            emb, id_col=id_col, vec_col=vec_col, block_col=None, threshold=cosine_threshold
        )
    first = emb.select(vec_col).first()
    if first is None:
        return emb.sparkSession.createDataFrame([], "id_a long, id_b long, cos double")
    dim = len(first[0])
    out = None
    for rep in range(repetitions):
        pairs = embedding_dupes_lsh(
            emb,
            id_col=id_col,
            vec_col=vec_col,
            threshold=cosine_threshold,
            n_planes=n_planes,
            seed=seed + rep,
            dim=dim,
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out.dropDuplicates(["id_a", "id_b"])


def brp_similarity_join(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    l2_threshold: float = 1.0,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH approx similarity self-join
    (L2 metric) — the library-native scale path for all-pairs vector
    near-dup (SURVEY.md §2.10 M3): candidate pairs come from shared
    LSH buckets, never an O(n²) cross join.

    Returns (id_a, id_b, l2_dist) with id_a < id_b.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from ..functions.vectors import as_double

    feat = emb.select(F.col(id_col), array_to_vector(as_double(vec_col)).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, l2_threshold, distCol="l2_dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("l2_dist", 6).alias("l2_dist"),
        )
        .where(F.col("id_a") < F.col("id_b"))
    )


def brp_recall_report(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    l2_threshold: float = 1.0,
    min_recall: float = 0.8,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Deterministic ACCEPTANCE AUDIT for ``brp_similarity_join``
    (round-6 verdict ask: make the MLlib-seeded q39 driver-checkable).
    The LSH pair SET is seeded inside the JVM library, so no external
    engine can reproduce it — but its CONTRACT is checkable with
    bit-stable outputs:

    - ``n_ref_pairs``: exact count of within-``block_col`` pairs at
      L2 <= threshold — an equi-join (no all-pairs), exactly
      computable by any engine;
    - ``lsh_within_threshold``: every LSH-returned pair's true L2 is
      inside the threshold (approxSimilarityJoin filters on the exact
      distance — this asserts that library guarantee);
    - ``recall_ok``: the LSH join recovers >= ``min_recall`` of the
      reference pairs (multi-table OR amplification: measured ~0.99+
      at num_hash_tables=4 on the fixtures; the bound is generous).

    One row out; the three aggregates are 1-row frames cross-broadcast
    together (the allowlisted scalar-BNL shape). A recall regression
    or a distance-contract violation flips a boolean and fails the
    oracle value-hash."""
    from ..functions.vectors import as_double, l2_distance

    e = emb.select(F.col(id_col), as_double(vec_col).alias("__v"), F.col(block_col))
    a = e.select(F.col(id_col).alias("id_a"), F.col("__v").alias("__va"), block_col)
    b = e.select(F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"), block_col)
    ref = (
        a.join(b, block_col)
        .where(F.col("id_a") < F.col("id_b"))
        .where(l2_distance(F.col("__va"), F.col("__vb")) <= F.lit(float(l2_threshold)))
        .select("id_a", "id_b")
    )
    lsh = brp_similarity_join(
        emb,
        id_col=id_col,
        vec_col=vec_col,
        l2_threshold=l2_threshold,
        bucket_length=bucket_length,
        num_hash_tables=num_hash_tables,
        seed=seed,
    )
    n_ref = ref.agg(F.count(F.lit(1)).alias("n_ref_pairs"))
    n_hit = lsh.join(ref, ["id_a", "id_b"]).agg(F.count(F.lit(1)).alias("__n_hit"))
    lsh_stats = lsh.agg(
        F.count(F.lit(1)).alias("__n_lsh"),
        F.coalesce(F.max("l2_dist"), F.lit(0.0)).alias("__max_d"),
    )
    return (
        n_ref.crossJoin(F.broadcast(n_hit))
        .crossJoin(F.broadcast(lsh_stats))
        .select(
            "n_ref_pairs",
            (F.col("__max_d") <= F.lit(float(l2_threshold)) + F.lit(1e-9)).alias(
                "lsh_within_threshold"
            ),
            (
                F.col("__n_hit")
                >= F.ceil(F.lit(float(min_recall)) * F.col("n_ref_pairs") - F.lit(1e-9))
            ).alias("recall_ok"),
        )
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic seeded Gaussian hyperplanes (driver-side numpy)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_buckets(
    emb: DataFrame, planes: list[list[float]], *, vec_col: str = "embedding"
) -> DataFrame:
    """Sign-LSH bucket id: bit b = 1 iff v·plane_b > 0. Built-in fold
    math; bucket becomes the shuffle/partition key at scale."""
    v = as_double(vec_col)
    bucket = F.lit(0).cast("bigint")
    for b, plane in enumerate(planes):
        bucket = bucket + F.when(dot(v, _query_lit(plane)) > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0)
        )
    return emb.withColumn("bucket", bucket)


def lsh_topk(
    emb_with_buckets: DataFrame,
    planes: list[list[float]],
    qvec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scan only the query's bucket (plus optional multiprobe — here
    exact-bucket for simplicity); exact cosine rank within."""
    qb = 0
    for b, plane in enumerate(planes):
        if sum(x * y for x, y in zip(qvec, plane)) > 0:
            qb |= 1 << b
    return cosine_topk(
        emb_with_buckets.where(F.col("bucket") == qb), qvec, k, id_col=id_col, vec_col=vec_col
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "vec_id",
    rank_col: str = "rank",
    k: int = 60,
    top: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09):
    combine N independent rankings of the same id space into one list
    by score(id) = Σ_r 1/(k + rank_r(id)) — the standard way to merge
    a lexical (BM25) and a vector (ANN) retriever without score
    calibration, robust because only RANKS enter.

    Determinism contract: each 1/(k+rank) term is one IEEE division of
    exact integers quantized to DECIMAL(28,12) before the sum; the
    final order breaks score ties by id. An id absent from a ranking
    simply contributes nothing (the RRF convention). Returns the top
    ``top`` rows as (id, n_lists, rrf_score).

    Shape: a unionByName of the (id, rank) frames — each typically
    already top-k-sized — one aggregation, one TakeOrdered. Fusion
    cost is O(Σ list lengths), independent of corpus size."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking frame")
    parts = [
        r.select(
            F.col(id_col),
            (
                F.lit(1.0) / (F.lit(k) + F.col(rank_col).cast("double"))
            ).cast("decimal(28,12)").alias("__term"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lists"),
            F.round(F.sum("__term").cast("double"), 9).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(top)
    )


def _sq8_scales(emb: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One-row per-dimension (min, max) scales frame for int8 scalar
    quantization: 2·dim exact MIN/MAX aggregates (map-side combinable,
    no float summation), broadcast back onto the corpus."""
    v = as_double(vec_col)
    return emb.agg(
        F.array(
            *[F.min(F.element_at(v, i + 1)) for i in range(dim)]
        ).alias("__mn"),
        F.array(
            *[F.max(F.element_at(v, i + 1)) for i in range(dim)]
        ).alias("__mx"),
    )


def quantize_embeddings(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar int8 quantization of an embedding column — the 4×
    memory/bandwidth compression an ANN serving tier applies before
    the exact-rerank stage (the IVF_SQ8 idea): per-dimension GLOBAL
    min/max scales, each value mapped to floor((x-mn)/(mx-mn)·255+0.5)
    − 128 ∈ [-128, 127] (a constant dimension maps to 0).

    Determinism contract: the scales are exact MIN/MAX aggregates (no
    float summation), the code is one double division + floor — any
    engine agrees bit-for-bit, so quantized results are
    oracle-checkable, unlike learned codebooks.

    Shape: ONE corpus pass for the 1-row scales frame (2·dim exact
    aggregates, map-side combinable), broadcast back onto the stream
    (1-row nested-loop — metadata class); quantization itself is
    in-row.  Returns (id, qvec array<int>)."""
    dim = len(emb.select(vec_col).first()[0])
    v = as_double(vec_col)
    return (
        emb.join(F.broadcast(_sq8_scales(emb, vec_col, dim)), how="cross")
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.when(
                    F.element_at("__mx", i) == F.element_at("__mn", i), F.lit(0)
                ).otherwise(
                    F.floor(
                        (F.element_at(v, i) - F.element_at("__mn", i))
                        / (F.element_at("__mx", i) - F.element_at("__mn", i))
                        * 255.0
                        + 0.5
                    ).cast("int")
                    - 128
                ),
            ).alias("qvec"),
        )
    )


def dequantize_embeddings(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The int8 reconstruction the serving tier actually scores:
    x̂_i = mn_i + code_i · (mx_i − mn_i)/255 with the same scales and
    floor rule as ``quantize_embeddings`` (a constant dimension
    reconstructs to its constant).  Asymmetric distance computation
    keeps the QUERY at full precision and ranks against x̂ — the affine
    de-shift is what preserves cosine direction; ranking raw shifted
    codes does not.  Same one-pass + broadcast shape.  Returns
    (id, dvec array<double>)."""
    dim = len(emb.select(vec_col).first()[0])
    v = as_double(vec_col)
    return (
        emb.join(F.broadcast(_sq8_scales(emb, vec_col, dim)), how="cross")
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.when(
                    F.element_at("__mx", i) == F.element_at("__mn", i),
                    F.element_at("__mn", i),
                ).otherwise(
                    F.element_at("__mn", i)
                    + F.floor(
                        (F.element_at(v, i) - F.element_at("__mn", i))
                        / (F.element_at("__mx", i) - F.element_at("__mn", i))
                        * 255.0
                        + 0.5
                    )
                    * (F.element_at("__mx", i) - F.element_at("__mn", i))
                    / 255.0
                ),
            ).alias("dvec"),
        )
    )


def quantization_recall(
    emb: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k acceptance row for int8 quantization: rank the corpus
    against the lowest-id probe vector by EXACT cosine and by the
    serving tier's ASYMMETRIC cosine (full-precision query against the
    int8 reconstruction, ``dequantize_embeddings``), and report
    |overlap| of the two top-k sets — the measurement that decides
    whether the compressed tier can serve first-stage retrieval.
    Counts exact, recall one IEEE division; deterministic end to end
    (the q58 acceptance-row discipline: an approximation shipped WITH
    its checked contract).  Returns one row (k, n_overlap, recall)."""
    probe = emb.orderBy(id_col).select(id_col, as_double(vec_col)).first()
    qvec = [float(x) for x in probe[1]]
    exact = cosine_topk(
        emb.where(F.col(id_col) != probe[0]), qvec, k, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("__e"))
    deq = dequantize_embeddings(emb, id_col=id_col, vec_col=vec_col)
    approx = cosine_topk(
        deq.where(F.col(id_col) != probe[0]), qvec, k, id_col=id_col, vec_col="dvec"
    ).select(F.col(id_col).alias("__a"))
    hit = exact.join(approx, exact["__e"] == approx["__a"], "inner")
    return (
        hit.agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(
            F.lit(k).alias("k"),
            "n_overlap",
            (F.col("n_overlap").cast("double") / k).alias("recall"),
        )
    )


def hard_negatives(
    emb: DataFrame,
    n_anchors: int = 4,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    salt_buckets: int = 256,
) -> DataFrame:
    """Hard-negative mining for contrastive training pairs: for each
    anchor vector, the top-k most-cosine-similar corpus vectors with a
    DIFFERENT label — the negatives that sit closest to the decision
    boundary, which is what a contrastive curriculum samples (the
    batch-construction step of a dual-encoder training pipeline).

    Determinism contract: anchors are the ``n_anchors`` lowest-id
    rows (data, not RNG); cosine is the sequential in-row fold
    (functions/vectors.py) rounded to 6 — ties break on ascending
    candidate id, so both rank phases are total orders.

    Shape (100 TB corpus, bounded anchor batch): the anchor frame is
    ``n_anchors`` rows — broadcast onto ONE corpus scan through the
    label-mismatch non-equi join (BroadcastNestedLoop over a
    query-batch-sized side, the metadata-broadcast class); top-k is
    the exact two-phase form — phase 1 ranks within (anchor, salt)
    buckets so no window partition is corpus-sized, phase 2 re-ranks
    the ≤ anchors·salt_buckets·k survivors.  Every global top-k
    element wins its own salt bucket, so the composition is exact.

    Returns (anchor_id, vec_id, cos, rank), rank 1..k per anchor."""
    anchors = F.broadcast(
        emb.orderBy(id_col)
        .limit(n_anchors)
        .select(
            F.col(id_col).alias("__aid"),
            as_double(vec_col).alias("__avec"),
            F.col(label_col).alias("__albl"),
        )
    )
    cand = (
        emb.join(anchors, emb[label_col] != F.col("__albl"))
        .select(
            F.col("__aid").alias("anchor_id"),
            F.col(id_col),
            F.round(cosine(as_double(vec_col), F.col("__avec")), 6).alias("cos"),
        )
    )
    order = [F.col("cos").desc(), F.col(id_col).asc()]
    local = Window.partitionBy(
        "anchor_id", F.pmod(F.xxhash64(id_col), F.lit(salt_buckets))
    ).orderBy(*order)
    survivors = (
        cand.withColumn("__rn", F.row_number().over(local))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
    final = Window.partitionBy("anchor_id").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
        .orderBy("anchor_id", "rank")
    )


def _dcg_weights(k: int) -> list[float]:
    """1/log2(i+1) for ranks 1..k, computed ONCE driver-side and baked
    into the plan as literals — both engines then consume identical
    doubles, so the eval row value-hashes (no runtime libm log in
    either engine; the q151-sqrt determinism argument, solved by
    constant folding instead of function choice)."""
    import math

    return [1.0 / math.log2(i + 1) for i in range(1, k + 1)]


def retrieval_eval(
    emb: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Retrieval-quality evaluation row — the eval-harness op a
    retrieval/RAG pipeline runs per index build: rank the corpus
    against the lowest-id probe by exact cosine and score the top-k
    against label-match relevance (same label = relevant) with
    precision@k, MRR, and nDCG@k.

    Determinism: the ranking is the q19 contract (6-rounded fold
    cosine, id tie-break); relevance is exact; the DCG discount
    weights are driver-computed literals (``_dcg_weights``) embedded
    in BOTH engines' plans; IDCG truncates the same literal cumsum at
    min(R, k), R = exact relevant-corpus count. One division each for
    precision/MRR/nDCG.

    Shape: one TakeOrdered scan for the top-k (the cosine_topk plan),
    one exact count for R, a k-row join back for labels — everything
    after the scan is metadata-sized. Returns one row
    (k, n_relevant, precision_at_k, mrr, dcg, idcg, ndcg)."""
    probe = emb.orderBy(id_col).select(id_col, as_double(vec_col), label_col).first()
    qid, qvec, qlabel = probe[0], [float(x) for x in probe[1]], probe[2]
    rest = emb.where(F.col(id_col) != qid)
    top = cosine_topk(rest, qvec, k, id_col=id_col, vec_col=vec_col)
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("cos"), F.asc(id_col)))
    ).join(emb.select(id_col, label_col), id_col)
    w = _dcg_weights(k)
    cumw = [sum(w[: i + 1]) for i in range(k)]
    rel = (F.col(label_col) == F.lit(qlabel)).cast("int")
    wexpr = F.element_at(F.array(*[F.lit(x) for x in w]), F.col("rank"))
    scored = ranked.select(
        F.col("rank").alias("__srank"),
        rel.alias("__rel"),
        (rel * wexpr).alias("__gain"),
        F.when(rel == 1, F.col("rank")).alias("__relrank"),
    )
    n_rel = rest.where(F.col(label_col) == F.lit(qlabel)).count()
    idcg = cumw[min(n_rel, k) - 1] if n_rel > 0 else 0.0
    # DCG is a float sum over the k gains: fold it in rank order (a
    # rank-sorted in-row fold after collect), never a distributed SUM
    # of doubles — the decimal-sum discipline's float sibling
    dcg = F.aggregate(
        F.array_sort(F.collect_list(F.struct("__srank", "__gain"))),
        F.lit(0.0),
        lambda acc, x: acc + x["__gain"],
    )
    return scored.agg(
        F.lit(k).alias("k"),
        F.lit(n_rel).cast("bigint").alias("n_relevant"),
        (F.sum("__rel").cast("double") / k).alias("precision_at_k"),
        F.coalesce(1.0 / F.min("__relrank"), F.lit(0.0)).alias("mrr"),
        dcg.alias("dcg"),
        F.lit(float(idcg)).alias("idcg"),
        (dcg / F.lit(float(idcg)) if idcg > 0 else F.lit(0.0)).alias("ndcg"),
    )


def matryoshka_recall(
    emb: DataFrame,
    dims: tuple[int, ...] = (4, 8, 16),
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-truncation retrieval eval (Kusupati et al. NeurIPS'22
    — MRL: nested prefixes of an embedding are usable representations):
    for each truncation width d, rank the corpus against the lowest-id
    probe by cosine over the FIRST d dimensions and report
    overlap/recall@k against the full-width exact ranking — the
    measurement that picks the cheapest serving width, the dimension-
    axis sibling of q201's precision-axis (int8) recall row.

    Deterministic end to end (the q58 acceptance-row discipline):
    probe = data (lowest id), cosine is the in-row fold rounded to 6
    (the q19 convention) at every width, ties break on ascending id,
    counts exact, recall one IEEE division.

    Scale shape: one TakeOrdered top-k scan per width (per-partition
    heaps, k rows shuffle) + k×k overlap joins — widths are a handful,
    so cost is |dims| linear scans; at serving scale each truncated
    scan reads d/D of the vector bytes, which is the point.
    """
    probe = emb.orderBy(id_col).select(id_col, as_double(vec_col)).first()
    qvec = [float(x) for x in probe[1]]
    corpus = emb.where(F.col(id_col) != probe[0])
    exact = cosine_topk(corpus, qvec, k, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("__e")
    )
    out = None
    for d in dims:
        trunc = corpus.select(
            F.col(id_col), F.slice(as_double(vec_col), 1, d).alias("__tv")
        )
        topd = cosine_topk(trunc, qvec[:d], k, id_col=id_col, vec_col="__tv").select(
            F.col(id_col).alias("__a")
        )
        row = (
            exact.join(topd, exact["__e"] == topd["__a"], "inner")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
            .select(
                F.lit(d).cast("int").alias("dim"),
                F.lit(k).cast("int").alias("k"),
                "n_overlap",
                (F.col("n_overlap").cast("double") / k).alias("recall"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("dim")


def jl_recall(
    emb: DataFrame,
    planes: list[list[float]],
    dims: tuple[int, ...] = (4, 8, 16),
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random-projection retrieval audit: rank
    the corpus against the lowest-id probe by cosine in a d-dim
    RANDOM PROJECTION (v → [v·p₁ … v·p_d], seeded Gaussian planes —
    Dasgupta & Gupta 2003's JL regime; Achlioptas JCSS'03 for the
    database-friendly variants) and report overlap/recall@k against
    the exact full-dimension ranking, for each d in ``dims``. The
    transform-axis sibling of q221's truncation audit
    (matryoshka_recall) and q201's precision audit (SQ8): together
    they price the three cheap-serving axes — fewer dims by prefix,
    fewer dims by projection, fewer bits per dim.

    Determinism/parity: the planes are seeded driver-side literals
    (the q234 convention); BOTH the corpus and the probe are projected
    IN-ENGINE from the stored doubles with the identical dot-fold, so
    no Python float arithmetic enters the comparison; projected
    cosines round to 6 with (cos DESC, id ASC) total order (the q19
    convention); recall is one IEEE division of exact counts.

    Scale shape: the projection is |dims_max| in-row dot folds — one
    narrow map over the corpus, materialized once (localCheckpoint)
    for the |dims|+1 rankings; each ranking is a TakeOrdered top-k
    (per-partition heaps, k rows shuffle); the probe row broadcasts.
    At serving scale the projected scan reads d/D of the vector
    bytes — the same point as q221, without requiring the embedding
    model to have been Matryoshka-trained.
    """
    maxd = max(dims)
    assert len(planes) >= maxd, "need a plane per projected dimension"
    v = as_double(vec_col)
    proj = F.array(*[dot(v, _query_lit(planes[j])) for j in range(maxd)])
    pts = emb.select(
        F.col(id_col), v.alias("__v"), proj.alias("__pv")
    ).localCheckpoint(eager=False)
    probe_id = pts.agg(F.min(id_col)).first()[0]  # 1-value metadata collect
    probe = pts.where(F.col(id_col) == probe_id).select(
        F.col("__v").alias("__qv"), F.col("__pv").alias("__pq")
    )
    corpus = pts.where(F.col(id_col) != probe_id).crossJoin(F.broadcast(probe))
    exact = (
        corpus.select(
            F.col(id_col), F.round(cosine(F.col("__v"), F.col("__qv")), 6).alias("__c")
        )
        .orderBy(F.col("__c").desc(), F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col).alias("__e"))
    )
    out = None
    for d in dims:
        topd = (
            corpus.select(
                F.col(id_col),
                F.round(
                    cosine(F.slice("__pv", 1, d), F.slice("__pq", 1, d)), 6
                ).alias("__c"),
            )
            .orderBy(F.col("__c").desc(), F.col(id_col).asc())
            .limit(k)
            .select(F.col(id_col).alias("__a"))
        )
        row = (
            exact.join(topd, exact["__e"] == topd["__a"], "inner")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
            .select(
                F.lit(d).cast("int").alias("dim"),
                F.lit(k).cast("int").alias("k"),
                "n_overlap",
                (F.col("n_overlap").cast("double") / k).alias("recall"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("dim")


def mutual_nn_pairs(
    emb: DataFrame,
    planes: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reciprocal (mutual) nearest-neighbor pairs within sign-LSH
    blocks — the alignment/dedup primitive (each side is the other's
    best neighbor; the RNN criterion of bitext mining and SemDeDup-
    style cluster pairing) computed block-locally so no all-pairs join
    ever forms.

    Semantics: candidates for a vector are its LSH bucket-mates; its
    best neighbor is the max (cosine round 6, ties to the SMALLEST
    candidate id — struct-max on (cos, -id)); a pair (a < b) is
    emitted iff best(a) = b AND best(b) = a. Block-local by design:
    the guarantee is "mutual within the bucket", the standard blocked
    trade-off (documented, oracle replays the same blocks).

    Scale: the only quadratic term is per-bucket (2^n_planes buckets
    partition the corpus; n_planes tunes the block width), the shuffle
    keys on bucket then on id — never a global cross join. Best-
    neighbor is a groupBy struct-max, mutuality one self-join on the
    best-edge frame.
    """
    b = lsh_buckets(emb, planes, vec_col=vec_col).select(
        F.col(id_col).alias("__id"), as_double(vec_col).alias("__v"), "bucket"
    )
    pairs = (
        b.alias("x")
        .join(b.alias("y"), "bucket")
        .where(F.col("x.__id") != F.col("y.__id"))
        .select(
            F.col("x.__id").alias("__a"),
            F.col("y.__id").alias("__b"),
            F.round(cosine(F.col("x.__v"), F.col("y.__v")), 6).alias("__cos"),
        )
    )
    best = pairs.groupBy("__a").agg(
        F.max(
            F.struct(F.col("__cos").alias("c"), (-F.col("__b")).alias("nb"))
        ).alias("__m")
    )
    # |V|-row frame consumed twice (forward + reversed side of the
    # mutuality join): materialize once or BOTH sides re-evaluate the
    # full bucket-pair + argmax lineage (measured 2x wall)
    edges = best.select(
        F.col("__a"),
        (-F.col("__m.nb")).alias("__best"),
        F.col("__m.c").alias("cos"),
    ).localCheckpoint(eager=False)
    rev = edges.select(
        F.col("__a").alias("__best"), F.col("__best").alias("__a")
    )
    return (
        edges.join(rev, ["__a", "__best"])
        .where(F.col("__a") < F.col("__best"))
        .select(
            F.col("__a").alias("vec_id_a"),
            F.col("__best").alias("vec_id_b"),
            "cos",
        )
        .orderBy("vec_id_a")
    )


def embedding_isotropy(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Corpus-level embedding geometry audit WITHOUT any pair join:
    mean norm, mean squared norm, and the EXACT mean pairwise dot
    product via the sum-vector identity

        Σ_{i≠j} v_i·v_j  =  ‖Σ v‖² − Σ‖v‖²

    — the anisotropy readout (Ethayarajh EMNLP 2019: contextual
    embeddings collapse into a cone; mean pairwise similarity near 1
    means the space is degenerate for cosine retrieval) computed in
    two linear passes where the naive form is an n² join.  The
    training-data gate before trusting an embedding column for ANN /
    SemDeDup.

    Exactness: per-component sums and per-row ‖v‖² are
    DECIMAL(28,12)-quantized before the distributed sums (q158 rule);
    ‖Σv‖² assembles on the ``dim``-row component frame; the final
    identity is fixed-parenthesization IEEE on ONE row.  mean_norm
    uses sqrt (correctly-rounded primitive) per row, decimal-summed.

    ``dim`` is VALIDATED, not assumed (round-8 ADVICE: it used to be
    dead while the q283 oracle hardcoded 64 — a mismatched column
    would run clean engine-side and break parity silently): any row
    whose vector length differs raises at execution time, so the
    caller's dim and the oracle's unnest bound are provably the same.

    Returns ONE row (n, mean_norm, mean_sq_norm, mean_pairwise_dot)
    round 6."""
    from ..functions.vectors import as_double, dot

    dec = lambda c: c.cast("decimal(28,12)")  # noqa: E731
    v = as_double(vec_col)
    guarded_sq = F.when(F.size(F.col("__v")) == dim, dot(F.col("__v"), F.col("__v"))).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"embedding_isotropy: expected {dim}-d vectors, got "),
                F.size(F.col("__v")).cast("string"),
            )
        )
    )
    per_row = emb.select(v.alias("__v")).select(
        F.col("__v"),
        guarded_sq.alias("__sq"),
    )
    row_stats = per_row.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec(F.col("__sq"))).alias("__ssq"),
        F.sum(dec(F.sqrt(F.col("__sq")))).alias("__snorm"),
    )
    comp = (
        per_row.select(F.posexplode("__v").alias("__p", "__x"))
        .groupBy("__p")
        .agg(F.sum(dec(F.col("__x"))).alias("__s"))
    )
    sumsq = comp.agg(
        F.sum(
            dec(F.col("__s").cast("double") * F.col("__s").cast("double"))
        ).alias("__normsq")
    )
    nd = F.col("n").cast("double")
    return row_stats.crossJoin(F.broadcast(sumsq)).select(
        "n",
        F.round(F.col("__snorm").cast("double") / nd, 6).alias("mean_norm"),
        F.round(F.col("__ssq").cast("double") / nd, 6).alias("mean_sq_norm"),
        F.round(
            (F.col("__normsq").cast("double") - F.col("__ssq").cast("double"))
            / (nd * (nd - F.lit(1.0))),
            6,
        ).alias("mean_pairwise_dot"),
    )
