"""Doc-drift gate: the self-reported counts in README.md / docs/
SCALING.md are DERIVED here from the actual entry-point surfaces, so
adding a query without updating the docs fails CI instead of shipping
stale numbers (round-1 advice)."""

from __future__ import annotations

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _surface():
    import __spark_entry__ as entry
    import bench

    q = entry.queries()
    o = entry.oracle_sql()
    return len(q), len(o), len(q) - len(o), len(bench.HEADLINE)


def test_readme_counts_match_entry_surface():
    n_q, n_oracle, n_rows_only, n_headline = _surface()
    text = (ROOT / "README.md").read_text()

    m = re.search(r"\((\d+) queries, (\d+) value-hash", text)
    assert m, "README lost its '(N queries, M value-hash' summary line"
    assert int(m.group(1)) == n_q
    assert int(m.group(2)) == n_oracle

    m = re.search(r"(\d+) rows-only entries", text)
    assert m, "README lost its rows-only count"
    assert int(m.group(1)) == n_rows_only

    m = re.search(r"headline timings \((\d+) queries", text)
    assert m, "README lost its headline-query count"
    assert int(m.group(1)) == n_headline

    m = re.search(r"on all (\d+) queries", text)
    assert m, "README lost its check_oracle coverage line"
    assert int(m.group(1)) == n_q


def test_scaling_md_counts_match_entry_surface():
    n_q, n_oracle, _, _ = _surface()
    text = (ROOT / "docs" / "SCALING.md").read_text()
    m = re.search(r"(\d+) of\s*\n?(\d+) entry queries value-hash match", text)
    assert m, "SCALING.md lost its oracle-coverage sentence"
    assert int(m.group(1)) == n_oracle
    assert int(m.group(2)) == n_q


def test_every_oracle_query_exists():
    import __spark_entry__ as entry

    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q), f"oracles without queries: {sorted(set(o) - set(q))}"


def test_driver_slot_rotation_covers_unproven_queries():
    """The correctness driver hard-checks only the first 50 registry
    entries.  Round-6 invariant (rotate by EVIDENCE AGE — the round-5
    verdict ask): the first 50 must contain (a) every query whose
    newest hash-green driver row predates round 3 (the r2-era q01-q50
    band), (b) the three newly-checkable queries q29/q39/q58 (first-
    ever value-hash evidence) and the two operators rewritten this
    round (q153 positional filter, q174 empty-doc fallback), and (c)
    every query never driver-checked at all (the q182+ additions)."""
    import json

    import __spark_entry__ as entry

    names = list(entry.queries())
    assert len(names) == len(set(names))

    def num(n: str) -> int:
        return int(n[1:].split("_", 1)[0])

    # newest hash-green round per query across the recorded history
    newest_green: dict[str, int] = {}
    for r in (1, 2, 3, 4, 5):
        d = json.loads((ROOT / f"CORRECTNESS_r{r:02d}.json").read_text())
        for k, v in d.items():
            if v.get("hash_match"):
                newest_green[k] = r

    first50 = set(names[:50])
    assert len(first50) == 50
    # (a) everything whose newest evidence is r2 or older is in the head
    stale = {n for n in names if newest_green.get(n, 0) <= 2 and n in newest_green}
    assert stale <= first50, sorted(stale - first50)
    # (b) newly-checkable + rewritten-this-round slots
    assert {num(n) for n in first50} >= (
        entry._R6_NEWLY_CHECKABLE | entry._R6_REWRITTEN
    )
    # (c) never-driver-checked queries (no row in any recorded round)
    # must be in the head — except those registered after the head
    # filled, which defer: _R6_DEFERRED_NEW to round 7's head,
    # _R7_DEFERRED_NEW (registered after THAT filled too) to rounds 8-9
    recorded = set()
    for r in (1, 2, 3, 4, 5):
        recorded |= set(json.loads((ROOT / f"CORRECTNESS_r{r:02d}.json").read_text()))
    never = {n for n in names if n not in recorded}
    deferred = {n for n in names if num(n) in entry._R6_DEFERRED_NEW}
    deferred_r8 = {n for n in names if num(n) in entry._R7_DEFERRED_NEW}
    assert never <= first50 | deferred | deferred_r8, sorted(
        never - first50 - deferred - deferred_r8
    )
    assert deferred.isdisjoint(first50) and deferred_r8.isdisjoint(first50)
    # after this head lands, nothing in the tail holds pre-r3 evidence:
    # the tail's oldest band is r3 (round 7's head) and it — plus the
    # round-7 deferred new queries, which also need round-7 slots —
    # fits in 50
    tail = [n for n in names[50:]]
    assert all(
        newest_green.get(n, 9) >= 3 for n in tail if n not in deferred | deferred_r8
    ), [n for n in tail if newest_green.get(n, 9) < 3 and n not in deferred | deferred_r8]
    assert (
        sum(1 for n in tail if newest_green.get(n) == 3) + len(deferred) <= 50
    )
    # schedule feasibility beyond round 7: a greedy oldest-first sweep
    # at 50 slots/round must keep every query within the sustainable
    # freshness bound ceil(N/50) rounds (N=225 -> 5).  Rounds 8-10 must
    # absorb the r4 band, the r5 band, and the round-8-deferred new
    # queries (which hold full oracles + local check_oracle evidence
    # meanwhile).
    r4_band = sum(1 for n in names if newest_green.get(n) == 4 and n not in first50)
    r5_band = sum(1 for n in names if newest_green.get(n) == 5 and n not in first50)
    assert r4_band + r5_band + len(deferred_r8) <= 150, (
        r4_band,
        r5_band,
        len(deferred_r8),
    )
    # oracle_sql iterates in the same rotated order (driver zips them)
    o = list(entry.oracle_sql())
    assert o == [n for n in names if n in set(o)]
