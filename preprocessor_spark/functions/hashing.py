"""Engine-portable deterministic hashing for the similarity/dedup family.

All near-duplicate machinery (MinHash permutations, SimHash bit-votes, LSH
hyperplanes) derives its randomness from **md5 arithmetic** instead of
Spark's xxhash64. md5 is bit-identical in every engine (it is a published
RFC-1321 digest of the UTF-8 bytes), so a third-party SQL engine can
reproduce the exact signatures, buckets, and candidate sets — which turns
every hash-based operator into a fully oracle-checkable query rather than a
rows-only one. The cost difference vs xxhash64 is irrelevant because the
scheme needs only ONE digest per shingle/word (the 64 MinHash permutations
come from double hashing, not 64 digests).

Layout of the 128-bit md5 hex digest ``m``:
  * ``h1`` = first 15 hex chars  → unsigned 60-bit integer (fits a long);
  * ``h2`` = hex chars 17..31, masked to 31 bits (``h2s``) so that
    ``h1 + i·h2s`` for i < 64 stays below 2^61 — no overflow before the
    Mersenne-prime modulus.

Permutation family (classic double hashing, Kirsch-Mitzenmacher):
  ``g_i = (h1 + i·h2s) mod (2^61 − 1)``  for i = 0..num_hashes−1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE61 = (1 << 61) - 1  # 2305843009213693951
H2_MASK = 0x7FFFFFFF  # 31 bits: 64·h2s < 2^37, h1 + 64·h2s < 2^61


def md5_h60(col: Column | str) -> Column:
    """Unsigned 60-bit hash from the first 15 hex chars of md5(col).

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_h31(col: Column | str) -> Column:
    """31-bit secondary hash from md5 hex chars 17..31.

    DuckDB equivalent:
    ``('0x' || substr(md5(x), 17, 15))::BIGINT & 2147483647``.
    """
    return (
        F.conv(F.substring(F.md5(col), 17, 15), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(H2_MASK))
    )


def digest_h60(m: Column) -> Column:
    """h1 from an already-computed md5 hex digest column — lets consumers
    that need BOTH h1 and h2 evaluate md5 once per row."""
    return F.conv(F.substring(m, 1, 15), 16, 10).cast("long")


def digest_h31(m: Column) -> Column:
    """h2s from an already-computed md5 hex digest column."""
    return (
        F.conv(F.substring(m, 17, 15), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(H2_MASK))
    )


def perm_hash(h1: Column, h2s: Column, i: int) -> Column:
    """i-th double-hashing permutation value (bounded, overflow-free)."""
    return (h1 + F.lit(i) * h2s) % F.lit(MERSENNE61)
