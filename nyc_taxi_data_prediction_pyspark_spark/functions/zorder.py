"""Z-order (Morton) clustering key as pure integer expressions —
multi-dimensional data clustering for row-group pruning.

``Warehouse.compact(sort_by=[...])`` gives ONE column a tight per-file
min/max envelope; sorting by a Z-value interleaves the bits of several
columns so range predicates on ANY of them skip most row groups — the
expression-level equivalent of Delta's OPTIMIZE ZORDER BY / Iceberg's
z-ordered rewrite. All shifts/masks are built-in bitwise ops (JVM-side,
codegen-friendly, no UDF) and exact integer math, so the key is
oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def zorder_key(*cols: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column (column i owns
    bit positions i, i+n, i+2n, …). Inputs are masked to ``bits`` so
    callers decide the quantization (e.g. ``col % 65536`` or a bucket
    id); n_cols·bits must stay ≤ 63 for BIGINT."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")
    key = F.lit(0).cast("bigint")
    for i, c in enumerate(cs):
        v = c.cast("bigint")
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + i
            ).cast("bigint")
    return key


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical computation as engine-agnostic SQL (DuckDB/ANSI
    bitwise syntax) — kept next to the Spark form so the two cannot
    drift; used by the q106 oracle."""
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            terms.append(f"((({c} >> {b}) & 1) << {b * n + i})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
