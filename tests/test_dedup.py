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


def test_blank_docs_never_fabricate_near_dup_pairs(spark):
    """NULL / empty / whitespace-only texts all collapse to the same
    degenerate signature ('' shingle for minhash, fill-0 for simhash): m
    blank docs used to emit m(m-1)/2 fabricated jaccard-1.0 / hamming-0
    pairs AND flood one blocking bucket (the O(n^2) join the module header
    promises never to build). Blank docs belong to exact dedup only."""
    rows = DOCS + [(7, None), (8, ""), (9, "   "), (10, None), (11, "\t\n")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    blank_ids = {7, 8, 9, 10, 11}

    mh = minhash_lsh_pairs(
        df, shingle_mode="word", shingle_k=3, jaccard_threshold=0.5
    )
    mh_pairs = {(r["id_a"], r["id_b"]) for r in mh.collect()}
    assert mh_pairs  # the real near-dups still come out
    assert not any(a in blank_ids or b in blank_ids for a, b in mh_pairs)

    sh = simhash_near_dups(df, max_hamming=10)
    sh_pairs = {(r["id_a"], r["id_b"]) for r in sh.collect()}
    assert not any(a in blank_ids or b in blank_ids for a, b in sh_pairs)

    # char mode: empty/NULL filtered, whitespace-only yields real shingles
    # of spaces — fine (they differ from content shingles)
    mh_char = minhash_lsh_pairs(df, jaccard_threshold=0.5)
    pairs_char = {(r["id_a"], r["id_b"]) for r in mh_char.collect()}
    assert not any(a in {7, 8, 10} or b in {7, 8, 10} for a, b in pairs_char)


def test_minhash_bands_must_divide_num_hashes(spark, docs):
    """bands > num_hashes degenerates every band key to '' (a full cross
    join); a non-divisor silently discards permutations. Both refused."""
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_pairs(docs, num_hashes=64, bands=128)
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_pairs(docs, num_hashes=64, bands=48)


def test_exact_dedup_uses_two_hash_families(spark, docs):
    """Deleting a document on a single 64-bit hash match is not exact at
    corpus scale; the key must carry two independent families (same
    contract as the streaming dedup)."""
    plan = dedup_exact(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in plan and "md5" in plan
