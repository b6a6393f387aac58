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

    m = re.search(r"the (\d+)\s*\n?rows-only queries", text)
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
    entries.  Round-5 invariant: the first 50 must contain (a) every
    query with no driver-green row in r01-r04 — that is q142+ (the
    post-freeze additions and anything new this round) — (b) the two
    round-4 red rows q58/q140, re-checked after their array-column
    fix, and (c) only declared-or-oldest-evidence re-confirmations in
    the remaining slots."""
    import json

    import __spark_entry__ as entry

    names = list(entry.queries())
    assert len(names) == len(set(names))

    proven = set()
    for f in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
    ):
        d = json.loads((ROOT / f).read_text())
        # hash-green, or the weaker rows-only check for queries with no
        # oracle (q20/q21/q29/q39 — their maximum attainable evidence)
        proven |= {
            k
            for k, v in d.items()
            if v.get("hash_match") or v.get("spark_rows") is not None
        }

    def num(n: str) -> int:
        return int(n[1:].split("_", 1)[0])

    never_checked = set(names) - proven
    first50 = set(names[:50])
    # (a) every never-driver-checked query is in the head
    assert never_checked <= first50, sorted(never_checked - first50)
    # (b) the round-4 reds are re-checked this round
    assert {"q58_approx_stats", "q140_last_n_features"} <= first50
    assert set(entry._DRIVER_RECONFIRM_R05) <= first50
    # (c) every fill slot is a re-confirmation from the oldest-evidence
    # pool (the round-3 head, single green row each) or a declared slot
    fills = first50 - never_checked - set(entry._DRIVER_RECONFIRM_R05)
    assert all(75 <= num(n) <= 118 for n in fills), sorted(fills)
    # oracle_sql iterates in the same rotated order (driver zips them)
    o = list(entry.oracle_sql())
    assert o == [n for n in names if n in set(o)]
