"""Engine-stable hashing (SURVEY.md §2.10 M4 support).

``xxhash64`` is fast but engine-specific; operators that must be
verifiable against a second engine (the DuckDB oracle — or any future
re-implementation) use a content-defined 60-bit hash derived from md5:
the first 15 hex digits parsed as an integer. Slower than xxhash64 but
bit-identical everywhere md5 exists.

The MinHash permutation family is the classic universal hash
h_i(x) = (a_i·x + b_i) mod p with p = 2^31 - 1 and seeded odd
constants. Inputs are first reduced mod p so every product stays
< 2^62 — Java longs would silently wrap and DuckDB's checked BIGINT
would raise; staying in range keeps both exact and equal.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MERSENNE_P = (1 << 31) - 1


def md5_int60(col: Column | str) -> Column:
    """First 60 bits of md5 as BIGINT — engine-stable token hash."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("bigint")


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k universal-hash permutations —
    plain LCG expansion of the seed so any engine can reproduce them."""
    params = []
    s = seed
    for _ in range(k):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (s % (MERSENNE_P - 1)) + 1  # a ∈ [1, p-1]
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = s % MERSENNE_P  # b ∈ [0, p-1]
        params.append((a, b))
    return params


def permute(hash_col: Column, a: int, b: int) -> Column:
    """(a·(x mod p) + b) mod p — overflow-free in 64-bit."""
    reduced = hash_col % F.lit(MERSENNE_P)
    return (reduced * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)
