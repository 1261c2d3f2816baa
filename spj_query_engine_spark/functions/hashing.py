"""Deterministic, engine-portable hashing.

Everything here computes the SAME value in Spark (JVM expressions — no Python
UDFs in the hot path) and in DuckDB (oracle SQL), so the driver's value-hash
gate can verify hash-based operators exactly.  The primitive is md5 (bit-for-
bit identical everywhere); integers are carved out of its hex prefix:

* ``h32``: first 8 hex chars → uint32 in [0, 2^32) — shingle hashing, LSH.
* ``h60``: first 15 hex chars → 60-bit non-negative int64 — SimHash planes.

MinHash uses the classic universal-hash family h_i(x) = (a_i·x + b_i) mod p
with p = 2^61-1 (Mersenne) and (a_i, b_i) drawn once from a seeded PRNG and
INLINED as literals into both engines' expressions.

Scale note: all of this is pure per-row JVM expression work inside whole-stage
codegen — it shuffles nothing and survives 100 TB unchanged.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE61 = (1 << 61) - 1


def h32(col: Column) -> Column:
    """uint32 from md5 prefix (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """Identical uint32 from md5 prefix (DuckDB side)."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def h60(col: Column) -> Column:
    """60-bit non-negative int64 from md5 prefix (Spark side).  15 hex chars
    keep the value inside int64 without sign issues."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k (a, b) pairs for the universal hash family, deterministic in seed."""
    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE61), rng.randrange(0, MERSENNE61)) for _ in range(k)]


def minhash_perm(hash_col: Column, a: int, b: int) -> Column:
    """(a·x + b) mod p on a uint32 hash — fits int64: a < 2^61, x < 2^32
    would overflow, so reduce a·x with % p via two-step split multiply.

    a·x = (a_hi·2^32 + a_lo)·x; with x < 2^32: a_hi·x < 2^61, a_lo·x < 2^64 —
    still overflow-prone, so do the arithmetic modulo p in pieces small
    enough for int64: ((a % p)·x) needs 93 bits worst-case.  Instead use
    a reduced multiplier a' = a mod 2^29 (keeps a'·x < 2^61) — the family
    stays universal enough for MinHash, and BOTH engines use the same a'.
    """
    a_small = a % (1 << 29)
    b_small = b % MERSENNE61
    return ((F.lit(a_small) * hash_col + F.lit(b_small)) % F.lit(MERSENNE61)).cast("long")


def minhash_perm_sql(hash_expr: str, a: int, b: int) -> str:
    a_small = a % (1 << 29)
    b_small = b % MERSENNE61
    return f"(({a_small} * {hash_expr} + {b_small}) % {MERSENNE61})"


def portable_round(col: Column, digits: int = 4) -> Column:
    """Engine-portable rounding: floor(x·10^d + 0.5)/10^d.  Unlike
    ``F.round`` (JVM BigDecimal of the shortest decimal repr, HALF_UP) vs
    DuckDB's raw-double scaling, every step here is an exact IEEE op, so both
    engines produce bit-identical results given identical inputs."""
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / F.lit(scale)


def portable_round_sql(expr: str, digits: int = 4) -> str:
    scale = float(10**digits)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
