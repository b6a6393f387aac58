"""Compute the NEXT round's driver-head rotation from the recorded
evidence, mechanically (the round-5 verdict's standing rule, applied
by hand every round so far):

  1. newest hash-green driver round per query across CORRECTNESS_r*.json
     — discounting greens older than the query's REWORKED_AT round
     (a lockstep impl+oracle rewrite invalidates prior attestations,
     round-12 ADVICE), and pinning the record set to
     CORRECTNESS_r01..r{--through-round} so a driver-side artifact
     drop mid-round can never change the arithmetic (default: the
     entry module's declared ROUND minus one);
  2. queries with no VALID green (never checked, only red, or
     reworked since their last green) are infinitely stale — they
     outrank every recorded band, oldest registration first;
  3. fill the 50 driver slots with the stalest queries: the no-valid-
     green class (greedy-oldest by query number) first, else the
     oldest recorded band, topped up in number order.

Prints the proposed head (50 names in driver order) plus the evidence
census, so the round-N+1 session can paste the numbers into
``__spark_entry__._R<N+1>_HEAD`` and the rotation test without
re-deriving them.  Read-only: this tool never edits the entry module.

Run it at ROUND START, after the driver's CORRECTNESS_r{N}.json for
the just-finished round is committed, with ``--through-round N`` (or
after bumping the entry's ROUND to N+1, which makes N the default).

Usage: python tools/next_head.py [--slots 50] [--through-round N]
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


def compute_head(
    names: list[str],
    slots: int = 50,
    through_round: int | None = None,
    reworked_at: dict[int, int] | None = None,
) -> tuple[list[str], dict[str, int], list[str]]:
    """The rotation rule as a pure function of (registry, records).

    Returns (head, census-as-{band: size}, no-valid-green list)."""
    records = sorted(
        f
        for f in os.listdir(ROOT)
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    )
    reworked_at = reworked_at or {}
    newest_green: dict[str, int] = {}
    for f in records:
        r = int(re.search(r"\d+", f).group())
        if through_round is not None and r > through_round:
            continue
        d = json.load(open(os.path.join(ROOT, f)))
        for k, v in d.items():
            if v.get("hash_match") and r >= reworked_at.get(num(k), 0):
                newest_green[k] = max(newest_green.get(k, 0), r)

    stale = sorted((n for n in names if n not in newest_green), key=num)
    bands: dict[int, list[str]] = {}
    for n in names:
        if n in newest_green:
            bands.setdefault(newest_green[n], []).append(n)

    head: list[str] = stale[:slots]
    if len(head) < slots:
        for r in sorted(bands):
            rest = slots - len(head)
            if rest <= 0:
                break
            head.extend(sorted(bands[r], key=num)[:rest])
    return head[:slots], {r: len(v) for r, v in sorted(bands.items())}, stale


def main() -> None:
    slots = 50
    if "--slots" in sys.argv:
        slots = int(sys.argv[sys.argv.index("--slots") + 1])

    import __spark_entry__ as entry

    through = getattr(entry, "ROUND", None)
    through = through - 1 if through is not None else None
    if "--through-round" in sys.argv:
        through = int(sys.argv[sys.argv.index("--through-round") + 1])

    names = list(entry.queries())
    reworked = dict(getattr(entry, "REWORKED_AT", {}))
    head, bands, stale = compute_head(
        names, slots=slots, through_round=through, reworked_at=reworked
    )

    census = {f"r{r}": c for r, c in bands.items()}
    census["no-valid-green"] = len(stale)
    print(f"records through round: {through if through is not None else 'ALL'}")
    if reworked:
        print("reworked-at discounts:", json.dumps(reworked, sort_keys=True))
    print("evidence census:", json.dumps(census))

    print(f"proposed head ({len(head)} slots):")
    for n in head:
        print(" ", n)
    entered = sum(1 for n in head if n in set(stale))
    remaining = len(stale) - entered
    print(
        f"deferral arithmetic: {len(stale)} no-valid-green, "
        f"{entered} enter this head, "
        f"{remaining} remain (need ceil({remaining}/{slots}) more rounds "
        f"before band re-greens resume)"
    )


if __name__ == "__main__":
    main()
