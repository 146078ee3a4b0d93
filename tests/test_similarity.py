"""Similarity search: brute-force exact top-k vs numpy oracle; LSH/IVF ANN
recall against the exact result."""

import numpy as np
import pandas as pd
import pytest

from preprocessor_spark.functions.similarity import brute_force_topk, ivf_topk, lsh_topk

RNG = np.random.default_rng(42)
DIM = 16
N = 400


@pytest.fixture(scope="module")
def vectors():
    v = RNG.normal(size=(N, DIM)).astype(np.float32)
    return v


@pytest.fixture(scope="module")
def emb_df(spark, vectors):
    pdf = pd.DataFrame(
        {"vec_id": range(N), "embedding": [row.tolist() for row in vectors]}
    )
    return spark.createDataFrame(pdf).cache()


def _oracle_topk(vectors, q, k):
    sims = vectors @ q / (np.linalg.norm(vectors, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(N), -sims))
    return list(order[:k]), sims


def test_brute_force_matches_numpy(spark, emb_df, vectors):
    q = vectors[7].astype(np.float64)
    got = brute_force_topk(emb_df, q.tolist(), k=10).collect()
    exp_ids, sims = _oracle_topk(vectors.astype(np.float64), q, 10)
    assert [r["vec_id"] for r in got] == exp_ids
    np.testing.assert_allclose(
        [r["cosine"] for r in got], sims[exp_ids], atol=1e-6
    )
    assert got[0]["vec_id"] == 7 and abs(got[0]["cosine"] - 1.0) < 1e-9


def test_lsh_topk_contains_query_and_subsets_bucket(spark, emb_df, vectors):
    q = vectors[7].astype(np.float64)
    got = lsh_topk(emb_df, q.tolist(), k=10, num_planes=4).collect()
    assert got[0]["vec_id"] == 7  # the query's own vector shares its bucket
    # ANN results are a subset of the corpus with valid cosine ordering
    cosines = [r["cosine"] for r in got]
    assert cosines == sorted(cosines, reverse=True)


def test_ivf_topk_recall(spark, emb_df, vectors):
    q = vectors[3].astype(np.float64)
    exact = [r["vec_id"] for r in brute_force_topk(emb_df, q.tolist(), k=5).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_topk(emb_df, q.tolist(), k=5, num_cells=8, nprobe=8).collect()
    ]
    # nprobe == num_cells probes everything → must equal exact search
    assert approx == exact
