"""Dedup suite correctness on constructed corpora with known duplicates."""

import pandas as pd
import pytest

from preprocessor_spark.functions.dedup import (
    dedup_exact,
    dedup_word_set,
    duplicate_stats,
    embedding_near_dups,
    minhash_lsh_pairs,
    simhash_near_dups,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "quick brown the fox jumps over the lazy dog near the river bank today"),  # word-set dup of 1
    (4, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup of 1
    (5, "completely different content about machine learning and data processing"),
    (6, "another unrelated document discussing spark performance tuning at scale"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"])
    ).cache()


def test_dedup_exact(spark, docs):
    kept = sorted(r["doc_id"] for r in dedup_exact(docs).select("doc_id").collect())
    assert kept == [1, 3, 4, 5, 6]  # doc 2 collapsed into doc 1


def test_duplicate_stats(spark, docs):
    row = duplicate_stats(docs).collect()[0]
    assert row["total_docs"] == 6
    assert row["distinct_texts"] == 5
    assert row["duplicate_docs"] == 1


def test_dedup_word_set(spark, docs):
    kept = sorted(r["doc_id"] for r in dedup_word_set(docs).select("doc_id").collect())
    # docs 2 (exact) and 3 (reordered words) collapse into doc 1
    assert kept == [1, 4, 5, 6]


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, shingle_k=5, jaccard_threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # the exact/word-set/near duplicates of doc 1 must all be found
    assert (1, 2) in got and (1, 3) in got and (1, 4) in got
    # unrelated docs must not pair
    assert not any(5 in p or 6 in p for p in got)
    # jaccard values are true jaccard (verified), monotone with similarity
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert j[(1, 2)] == 1.0
    assert j[(1, 4)] < 1.0


def test_simhash_near_dups(spark, docs):
    pairs = simhash_near_dups(docs, max_hamming=10).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got  # identical text → hamming 0
    assert not any((5 in p and 6 in p) for p in got)
    h = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert h[(1, 2)] == 0


def test_embedding_near_dups(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),  # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = embedding_near_dups(df, threshold=0.99, num_planes=4).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert len(got) == 1


def test_minhash_permutations_not_degenerate(spark):
    """Regression for the double-hashing trap: with g_i = h1 + i*h2s
    (h2s 31-bit vs h1 60-bit), ONE shingle won every permutation — the
    64-value signature was rank-1, banding degenerated from
    1-(1-J^4)^16 to ~J (≈10% recall loss, linear band-bucket growth at
    scale). The affine family must spread the minima across many distinct
    winning shingles."""
    import hashlib

    from preprocessor_spark.functions.hashing import (
        MERSENNE31,
        perm_coeffs,
    )

    shingles = [f"shingle number {i} text" for i in range(200)]
    h1s = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MERSENNE31
        for s in shingles
    ]
    winners = set()
    for i in range(64):
        a, b = perm_coeffs(i)
        vals = [(a * h + b) % MERSENNE31 for h in h1s]
        winners.add(vals.index(min(vals)))
    # 64 independent-ish permutations over 200 shingles: expect ~50+
    # distinct winners; the degenerate family yields exactly 1
    assert len(winners) > 20, f"only {len(winners)} distinct argmin shingles"


def test_minhash_signature_twin_matches_pipeline(spark, docs):
    """The expression-level minhash_signature (HOF) and the pipeline's
    codegen'd min-aggregate must produce bit-identical signature values."""
    from pyspark.sql import functions as F

    from preprocessor_spark.functions.dedup import (
        minhash_lsh_pairs,
        minhash_signature,
        release_caches,
        word_shingles,
    )

    res = minhash_lsh_pairs(docs, shingle_mode="word", shingle_k=3)
    sig_pipeline = res._attached_caches[1]
    sig_hof = docs.select(
        "doc_id",
        minhash_signature(
            F.array_distinct(word_shingles("text", 3)), 64
        ).alias("sig"),
    )
    j = sig_pipeline.join(sig_hof, "doc_id")
    checks = [
        (F.col(f"__g{i}") == F.element_at("sig", i + 1)) for i in range(64)
    ]
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    assert j.filter(~cond).count() == 0
    release_caches(res)


def test_embedding_near_dups_validates_dim(spark):
    """A mistyped dim must fail fast, not silently return zero pairs:
    under non-ANSI Spark, element_at past the array end returns NULL,
    NULL-poisoning every cosine (round-4 ADVICE, dedup.py dim param)."""
    import pytest as pt

    rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.999, 0.01, 0.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    with pt.raises(ValueError, match="does not match"):
        embedding_near_dups(df, threshold=0.99, num_planes=4, dim=8)
    with pt.raises(ValueError, match="does not match"):
        embedding_near_dups(df, threshold=0.99, num_planes=4, dim=3)
    # the correct dim still works and finds the pair on the codegen path
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(
            df, threshold=0.99, num_planes=4, dim=4
        ).collect()
    }
    assert got == {(1, 2)}


def test_simhash_blocking_plan_guarantee():
    """The combinatorial blocking must be lossless by construction: with s
    slices and (s−k)-subsets as keys, ≤k flipped bits dirty ≤k slices, so
    some subset stays clean. Checked exhaustively over the plan's own
    parameters for every supported max_hamming."""
    from math import comb

    from preprocessor_spark.functions.dedup import simhash_blocking_plan

    for k in range(0, 21):
        s, subsets = simhash_blocking_plan(k)
        assert 60 % s == 0 and s > k
        c = len(subsets[0])
        assert all(len(sub) == c for sub in subsets)
        # the guarantee needs ALL c-subsets (or the c=1 fallback's full
        # slice cover): any k-dirty pattern must leave one subset clean
        if c == 1:
            assert len(subsets) == s
        else:
            assert c == s - k and len(subsets) == comb(s, c)

    # the full supported radius works (fallback s=60, c=1)...
    s, subsets = simhash_blocking_plan(59)
    assert s == 60 and len(subsets) == 60
    # ...and out-of-range radii fail loudly instead of a bare
    # StopIteration (>=60) or silently emitting zero blocking rows (<0)
    import pytest as pt

    for bad in (-1, 60, 61):
        with pt.raises(ValueError, match="max_hamming"):
            simhash_blocking_plan(bad)


def test_simhash_block_keys_collide_within_hamming(spark):
    """Pairs of signatures within max_hamming must share ≥1 (ci, cv) block
    key — the lossless-candidate-generation property the near-dup join
    relies on. Signatures are adversarial: k flips spread across DISTINCT
    slices (the worst case for pigeonhole)."""
    import random

    from preprocessor_spark.functions.dedup import (
        simhash_block_keys,
        simhash_blocking_plan,
    )

    k = 3
    s, _subsets = simhash_blocking_plan(k)
    rng = random.Random(7)
    rows = []
    for i in range(40):
        base = rng.getrandbits(60)
        # flip one bit in each of k distinct slices — dirties the maximum
        # possible number of slices
        slices = rng.sample(range(s), k)
        flipped = base
        for sl in slices:
            flipped ^= 1 << (sl * (60 // s) + rng.randrange(60 // s))
        rows.append((2 * i, base))
        rows.append((2 * i + 1, flipped))
    sh = spark.createDataFrame(rows, ["doc_id", "simhash"])
    keys = simhash_block_keys(sh, "doc_id", k).collect()
    by_doc = {}
    for r in keys:
        by_doc.setdefault(r["doc_id"], set()).add((r["ci"], r["cv"]))
    for i in range(40):
        a, b = by_doc[2 * i], by_doc[2 * i + 1]
        assert a & b, f"pair {i} shares no block key: {sorted(a)} vs {sorted(b)}"
