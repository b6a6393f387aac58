"""Promote a bench run to the OFFICIAL sf0.1 record, mechanically.

The driver overwrites (and commits) ``BENCH_DETAIL_sf0.1_latest.json``
with its own post-close rerun every round, so doc guards pin to the
builder-owned ``BENCH_OFFICIAL_sf0.1.json`` instead (round-10 fix for
the round-8/9 doc-guard failure class).  Promotion is a deliberate
builder act; this tool is the mechanical form of it:

  1. reads the candidate detail file (default: the ``_latest`` just
     written by ``bench.py``);
  2. compares totals and canaries against the current official record
     and REFUSES to promote a run that is slower at a not-meaningfully-
     calmer canary (override with --force, e.g. after the headline set
     grows and totals are incomparable);
  3. copies the candidate over ``BENCH_OFFICIAL_sf0.1.json`` and
     rewrites the README "Latest committed record: ...s for N queries"
     sentence numbers in place, so the test-pinned prose and the
     artifact move in the SAME commit (tests/test_docs.py enforces the
     match).

Usage: python tools/promote_record.py [candidate.json] [--force]
Read-only until the final write; prints what it would change first.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OFFICIAL = os.path.join(ROOT, "BENCH_OFFICIAL_sf0.1.json")
README = os.path.join(ROOT, "README.md")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv
    cand_path = args[0] if args else os.path.join(
        ROOT, "BENCH_DETAIL_sf0.1_latest.json"
    )
    cand = json.load(open(cand_path))
    cur = json.load(open(OFFICIAL))

    c_tot, o_tot = cand["total_sec"], cur["total_sec"]
    c_sched = (cand.get("canary") or {}).get("sched_20job")
    o_sched = (cur.get("canary") or {}).get("sched_20job")
    print(f"candidate: {c_tot}s / {cand['n_queries']}q, sched {c_sched}")
    print(f"official : {o_tot}s / {cur['n_queries']}q, sched {o_sched}")

    # totals are only comparable over the SAME headline set: a
    # truncated run (crash mid-suite) or a changed set has a lower /
    # different total that would otherwise auto-promote a bogus record
    # (round-10 ADVICE, medium).
    if cand["n_queries"] != cur["n_queries"] and not force:
        print(
            "REFUSING: candidate covers "
            f"{cand['n_queries']} queries vs official {cur['n_queries']} — "
            "totals are incomparable (pass --force only for a deliberate "
            "headline-set change, never a truncated run)"
        )
        sys.exit(1)

    if c_sched is None or o_sched is None:
        print(
            "WARNING: sched_20job canary missing from "
            + ("candidate" if c_sched is None else "official")
            + " — calm-canary promotion disabled, comparing totals only"
        )
    calmer = (
        c_sched is not None and o_sched is not None and c_sched < o_sched * 0.9
    )
    better = c_tot < o_tot or calmer
    if not better and not force:
        print(
            "REFUSING: candidate is slower without a meaningfully calmer "
            "canary (pass --force if the headline set changed)"
        )
        sys.exit(1)
    if better and c_tot >= o_tot:
        print(
            "WARNING: promoting a SLOWER total on calm-canary grounds "
            f"({c_tot}s >= {o_tot}s, sched {c_sched} vs {o_sched}) — the "
            "README record sentence will regress; make sure that is the "
            "intent"
        )

    shutil.copyfile(cand_path, OFFICIAL)
    text = open(README).read()
    new_text, n = re.subn(
        r"Latest committed record: [\d.]+s for \d+ queries",
        f"Latest committed record: {round(c_tot, 1)}s for "
        f"{cand['n_queries']} queries",
        text,
    )
    assert n == 1, "README record sentence not found (or found twice)"
    open(README, "w").write(new_text)
    print(
        f"PROMOTED {os.path.basename(cand_path)} -> BENCH_OFFICIAL_sf0.1"
        f".json and rewrote the README sentence ({round(c_tot, 1)}s / "
        f"{cand['n_queries']}q). Commit both together; update the canary "
        "numbers in the surrounding prose by hand if they moved."
    )


if __name__ == "__main__":
    main()
