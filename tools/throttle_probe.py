"""Measured expr-vs-pandas crossover for ``throttle_last_segmented``
at its design point (the round-4 verdict's ask).

The operator ships two chunk-table backends with a documented
division of labor:

- ``method="expr"`` — per-candidate scalar F.aggregate folds, zero
  Python; cost O(candidates x chunk_events) per (group, chunk).
- ``method="pandas"`` — numpy pointer-doubling over the successor
  function, O(n log n) per chunk INDEPENDENT of candidate count, paying
  a fixed ~2-3 ms Arrow round-trip per (group, chunk).

The candidate count is bounded by the number of events in a chunk's
first gap window, i.e. event_rate x min_gap.  Human-scale feeds
(rate x gap ~ 10^1..10^2) keep the expr product tiny; the pandas path
exists for DENSE chunks (rate x gap >> 10^3 — kHz telemetry throttled
at multi-second/hour gaps) where candidates x chunk_events explodes.
This probe measures both backends on BOTH regimes with a deterministic
synthetic feed, verifies the two (and the unsegmented reference fold)
agree exactly, and prints one JSON line per regime.

Feed construction (pure column arithmetic, no host entropy): event i
of group g fires at ``i * period_us + jitter`` with
``jitter = (i * 2654435761) % (period_us // 2)`` — a fixed LCG-ish
scatter so chunk boundaries do not align with event spacing.

Usage: python tools/throttle_probe.py [regime ...]   (default: both)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REGIMES = {
    # name: (groups, events/group, period_us, gap_us, chunk_us)
    # sparse: ~1 event/s throttled at 60 s -> ~60 candidates/window;
    # the regime every human-scale feed lives in (expr's home turf)
    "sparse_1Hz_gap60s": (4, 40_000, 1_000_000, 60_000_000, 3_600_000_000),
    # dense: 1 kHz throttled at 2 s -> ~2000 candidates/window, 10k
    # events per 10 s chunk: candidates x chunk_events ~ 2x10^7 fold
    # steps PER (group, chunk) for expr vs one O(n log n) numpy pass
    # for pandas (the design point the pandas path exists for)
    "dense_1kHz_gap2s": (4, 40_000, 1_000, 2_000_000, 10_000_000),
}


def build_feed(spark, groups: int, n: int, period_us: int):
    jmod = max(period_us // 2, 1)
    return (
        spark.range(groups * n)
        .select(
            (F.col("id") % groups).cast("string").alias("g"),
            F.timestamp_micros(
                (F.col("id") / groups).cast("bigint") * period_us
                + ((F.col("id") / groups).cast("bigint") * 2654435761) % jmod
            ).alias("ts"),
        )
    )


def run(regime: str) -> dict:
    from nyc_taxi_data_prediction_pyspark_spark.operators.windows import (
        throttle_last,
        throttle_last_segmented,
    )
    from nyc_taxi_data_prediction_pyspark_spark.session import get_spark

    groups, n, period, gap, chunk = REGIMES[regime]
    spark = get_spark("throttle_probe")
    feed = build_feed(spark, groups, n, period).localCheckpoint()

    def canon(df):
        return sorted(map(tuple, df.collect()))

    out: dict = {
        "groups": groups,
        "events_per_group": n,
        "cand_per_window": gap // period,
        "events_per_chunk": chunk // period,
    }
    ref = canon(throttle_last(feed, partition=["g"], ts="ts", min_gap_micros=gap))
    for method in ("expr", "pandas"):
        t0 = time.perf_counter()
        got = canon(
            throttle_last_segmented(
                feed,
                partition=["g"],
                ts="ts",
                min_gap_micros=gap,
                chunk_micros=chunk,
                method=method,
            )
        )
        out[f"{method}_s"] = round(time.perf_counter() - t0, 3)
        assert got == ref, f"{regime}/{method} diverged from the reference fold"
    out["exact_match"] = True
    return out


def main() -> None:
    names = sys.argv[1:] or list(REGIMES)
    if len(names) > 1:
        # isolated sessions, same rationale as scale_probe.py
        import subprocess

        merged = {}
        for name in names:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True,
                text=True,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            merged[name] = (
                json.loads(line[-1])[name]
                if line
                else {"error": (r.stderr or "no output")[-300:]}
            )
            print(f"# {name}: {merged[name]}", file=sys.stderr)
        print(json.dumps(merged))
        return
    print(json.dumps({names[0]: run(names[0])}))


if __name__ == "__main__":
    main()
