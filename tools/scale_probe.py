"""Empirical scale probe: replicate sf0.1 10x (content-distinct, key
offsets) into a scratch dir and measure wall-clock scaling factors for
representative headline operators. A linear-or-better factor (<= ~10x
wall at 10x rows on fixed local[32] resources) is the evidence that an
operator's plan has no super-linear term hiding at test scale — the
empirical complement to docs/SCALING.md's analytical budgets.

Replication rules (growth where growth happens in production):
- facts (lineitem, orders):   x10, orderkey-space offset per replica
- events:                     x10, event/user id offsets (new users)
- documents:                  x10, doc_id offset + every token tagged
  with the replica id, so replicas are content-DISTINCT: shingle
  posting lists keep their base length while the corpus grows 10x,
  and the probe measures PLAN scaling. (The alternative — replicas as
  near-duplicates — measures output growth instead: a corpus where
  every doc has k near-copies inherently yields O(k^2) true pairs per
  cluster; measured 122x wall at 10x rows in that regime, which is
  the cluster-quadratic OUTPUT, not a plan defect — the max_posting
  cap is the guard when clusters degenerate further.)
- embeddings:                 x10, vec_id offset
- dims (customer/supplier/part/nation/region): unchanged

Usage: python tools/scale_probe.py [query ...]
Prints one JSON line {query: {base_s, x10_s, factor}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/sparkgraft_scale10")
REPLICAS = 10

DEFAULT_QUERIES = [
    "q01_pricing_summary",
    "q13_exact_dedup",
    "q17_ngram_jaccard_dedup",
    "q25_order_revenue_topk",
    "q36_sessionization",
    "q76_pretrain_packing",
    "q108_stream_attribution",
    "q109_pagerank",
    "q111_grouped_topk",
    "q114_incremental_rollup",
    "q120_heavy_hitters",
    "q121_table_checksum",
    "q122_triangle_count",
    "q127_point_in_time_join",
    "q141_throttle_segmented",
    "q142_kmeans_clusters",
    "q148_leakage_safe_split",
    "q149_quality_canonical_dedup",
]

KEY_OFFSET = 100_000_000


def build_scaled(spark) -> None:
    from pyspark.sql import functions as F

    from nyc_taxi_data_prediction_pyspark_spark.catalog import TABLES, load

    if os.path.exists(os.path.join(SCALE_DIR, "_DONE")):
        return
    os.makedirs(SCALE_DIR, exist_ok=True)
    # write timestamps as µs int64, matching the base testdata's physical
    # type (Spark's default INT96 would flip the events reader's unit
    # detection to a different code path than the one bench exercises)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    for name in TABLES:
        df = load(spark, BASE, name)
        out = os.path.join(SCALE_DIR, f"{name}.parquet")
        if name in ("region", "nation", "customer", "supplier", "part"):
            df.write.mode("overwrite").parquet(out)
            continue
        reps = []
        for r in range(REPLICAS):
            off = F.lit(r * KEY_OFFSET).cast("bigint")
            d = df
            if name == "lineitem":
                d = d.withColumn("l_orderkey", F.col("l_orderkey") + off)
            elif name == "orders":
                d = d.withColumn("o_orderkey", F.col("o_orderkey") + off)
            elif name == "events":
                d = d.withColumn("event_id", F.col("event_id") + off).withColumn(
                    "user_id", F.col("user_id") + off
                )
            elif name == "documents":
                d = d.withColumn("doc_id", F.col("doc_id") + off).withColumn(
                    "text", F.regexp_replace(F.col("text"), r"(\S+)", rf"$1{r}x")
                )
            elif name == "embeddings":
                d = d.withColumn("vec_id", F.col("vec_id") + off)
            reps.append(d)
        big = reps[0]
        for d in reps[1:]:
            big = big.unionByName(d)
        big.write.mode("overwrite").parquet(out)
    open(os.path.join(SCALE_DIR, "_DONE"), "w").write("ok")


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    if len(names) > 1:
        # one subprocess per query: a heavy query's lingering shuffle
        # files / GC pressure otherwise contaminate the NEXT query's
        # x10 measurement (observed: q76 read 24x after q17's x10 run
        # in the same session, but 1.8x isolated)
        import subprocess

        merged = {}
        for name in names:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if line:
                merged.update(json.loads(line[-1])["queries"])
            else:
                merged[name] = {"error": (r.stderr or "no output")[-300:]}
            print(f"# {name}: {merged.get(name)}", file=sys.stderr)
        print(json.dumps({"replicas": REPLICAS, "queries": merged}))
        return

    import __spark_entry__ as entry

    from nyc_taxi_data_prediction_pyspark_spark.session import get_spark

    spark = get_spark("scale_probe")
    build_scaled(spark)
    qs = entry.queries()
    name = names[0]
    qs[name](spark, BASE).count()  # warm
    t0 = time.perf_counter()
    qs[name](spark, BASE).count()
    base_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    qs[name](spark, SCALE_DIR).count()
    x10_s = time.perf_counter() - t0
    out = {
        name: {
            "base_s": round(base_s, 3),
            "x10_s": round(x10_s, 3),
            "factor": round(x10_s / base_s, 2) if base_s > 0 else None,
        }
    }
    print(json.dumps({"replicas": REPLICAS, "queries": out}))


if __name__ == "__main__":
    main()
