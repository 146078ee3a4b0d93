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
  * ``h1`` = first 15 hex chars → unsigned 60-bit integer (fits a long).

MinHash permutation family — per-permutation affine transforms over the
single base digest:
  ``g_i = (a_i · (h1 mod M31) + b_i) mod M31``,  M31 = 2^31 − 1,
with ``(a_i, b_i)`` md5-derived per-permutation constants (perm_coeffs,
computed ONCE on the driver and inlined as literals). All arithmetic stays
below 2^62, portable to any 64-bit SQL engine.

Why not double hashing: the previous family ``g_i = (h1 + i·h2s) mod M61``
(Kirsch–Mitzenmacher, with h2s masked to 31 bits for overflow safety) is a
MinHash-specific trap: ``i·h2s ≤ 2^37`` perturbs a 2^60-range h1 by ~1 part
in 8 million, so whenever the gap between a document's two smallest h1
values exceeds 2^37 (typical once the corpus has < ~2^23 distinct
shingles, and overwhelmingly likely far beyond that), the SAME shingle
wins every permutation — the 64-value signature is rank-1, banding's
S-curve 1−(1−J^r)^b degenerates to ~J (measured: ~10% of true J≥0.85
near-dups missed, and band buckets growing linearly with corpus size
because every document containing the globally-minimal shingle collides).
Per-permutation affine transforms scramble the ORDER of the base hashes
independently per i, which is what MinHash actually requires.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = (1 << 31) - 1  # 2147483647


def md5_h60(col: Column | str) -> Column:
    """Unsigned 60-bit hash from the first 15 hex chars of md5(col).

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def digest_h60(m: Column) -> Column:
    """h1 from an already-computed md5 hex digest column — lets consumers
    that need BOTH h1 and h2 evaluate md5 once per row."""
    return F.conv(F.substring(m, 1, 15), 16, 10).cast("long")


def perm_coeffs(i: int, seed: int = 42) -> tuple[int, int]:
    """Per-permutation affine coefficients (a_i ∈ [1, M31−1], b_i ∈ [0,
    M31−1]), md5-derived so any engine can re-derive them:
    ``a_i = ('0x'||substr(md5('perm_a:{seed}:{i}'),1,15))::BIGINT
    % (M31−1) + 1`` and ``b_i = ...('perm_b:...') % M31``. Computed on the
    driver and inlined as literals — no per-row md5 for the permutations."""
    a = (
        int(hashlib.md5(f"perm_a:{seed}:{i}".encode()).hexdigest()[:15], 16)
        % (MERSENNE31 - 1)
        + 1
    )
    b = (
        int(hashlib.md5(f"perm_b:{seed}:{i}".encode()).hexdigest()[:15], 16)
        % MERSENNE31
    )
    return a, b


def perm_hash_affine(h1: Column, i: int, seed: int = 42) -> Column:
    """i-th MinHash permutation value: ``(a_i·(h1 mod M31) + b_i) mod M31``.

    a_i < 2^31 and (h1 mod M31) < 2^31 keep the product below 2^62 —
    overflow-free in signed 64-bit arithmetic on any engine."""
    a, b = perm_coeffs(i, seed)
    return (F.lit(a) * (h1 % F.lit(MERSENNE31)) + F.lit(b)) % F.lit(MERSENNE31)
