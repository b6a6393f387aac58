"""Compute the NEXT round's driver-head rotation from the recorded
evidence, mechanically (the round-5 verdict's standing rule, applied
by hand every round so far):

  1. newest hash-green driver round per query across CORRECTNESS_r*.json;
  2. never-driver-checked queries are infinitely stale — they outrank
     every recorded band, oldest registration first;
  3. fill the 50 driver slots with the stalest queries: never-checked
     (greedy-oldest by query number) first if they are the stalest
     class, else the oldest recorded band, topped up with the oldest
     never-checked deferrals.

Prints the proposed head (50 names in driver order) plus the evidence
census, so the round-N+1 session can paste the numbers into
``__spark_entry__._R<N+1>_*`` and the rotation test without re-deriving
them.  Read-only: this tool never edits the entry module.

Run it at ROUND START, after the driver's CORRECTNESS_r{N}.json for
the just-finished round is committed — the proposal is only as fresh
as the newest record on disk (pre-commit it still sees the previous
round's evidence and proposes last round's unretired staleness).
With CORRECTNESS_r09 in-tree this prints q201–q250 — exactly the
round-8 verdict's "first row by round 11" schedule.

Usage: python tools/next_head.py [--slots 50]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def num(name: str) -> int:
    return int(name[1:].split("_", 1)[0])


def main() -> None:
    slots = 50
    if "--slots" in sys.argv:
        slots = int(sys.argv[sys.argv.index("--slots") + 1])

    import __spark_entry__ as entry

    names = list(entry.queries())
    records = sorted(
        f
        for f in os.listdir(ROOT)
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    )
    newest_green: dict[str, int] = {}
    for f in records:
        r = int(re.search(r"\d+", f).group())
        d = json.load(open(os.path.join(ROOT, f)))
        for k, v in d.items():
            if v.get("hash_match"):
                newest_green[k] = max(newest_green.get(k, 0), r)

    never = sorted((n for n in names if n not in newest_green), key=num)
    bands: dict[int, list[str]] = {}
    for n in names:
        if n in newest_green:
            bands.setdefault(newest_green[n], []).append(n)

    census = {f"r{r}": len(v) for r, v in sorted(bands.items())}
    census["never"] = len(never)
    print("evidence census:", json.dumps(census))

    # never-checked outrank every recorded band (no evidence at all)
    head: list[str] = never[:slots]
    if len(head) < slots:
        for r in sorted(bands):
            rest = slots - len(head)
            if rest <= 0:
                break
            head.extend(sorted(bands[r], key=num)[:rest])
    head = head[:slots]

    print(f"proposed head ({len(head)} slots):")
    for n in head:
        print(" ", n)
    remaining = len(never) - sum(1 for n in head if n in set(never))
    print(
        f"deferral arithmetic: {len(never)} never-checked, "
        f"{sum(1 for n in head if n in set(never))} enter this head, "
        f"{remaining} remain (need ceil({remaining}/{slots}) more rounds "
        f"before band re-greens resume)"
    )


if __name__ == "__main__":
    main()
