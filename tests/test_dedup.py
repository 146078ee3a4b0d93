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
