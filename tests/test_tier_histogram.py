"""Mergeable tier histograms (rollup/tiers.py histogram_agg/reagg,
hist_percentile): bin counts match a pandas oracle, re-aggregate exactly
up the tree, fold through incremental merge, and yield percentile
estimates within a bin width of numpy's."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from preprocessor_spark.rollup.incremental import merge_partials
from preprocessor_spark.rollup.tiers import (
    RollupTree,
    TierSpec,
    algebraic_aggs,
    hist_percentile,
    histogram_agg,
    histogram_reagg,
)
from preprocessor_spark.synth import token_sequences

LO, HI, NB = 0.0, 128.0, 16


@pytest.fixture(scope="module")
def corpus(spark):
    return token_sequences(spark, 4000).cache()


def _pd_hist(vals):
    idx = np.clip(np.floor((vals - LO) / ((HI - LO) / NB)), 0, NB - 1).astype(int)
    return np.bincount(idx, minlength=NB)


def _agg_1h(corpus):
    return corpus.groupBy(
        "source", F.date_trunc("hour", "ts").alias("bucket_start")
    ).agg(
        *algebraic_aggs(F.col("n_tok").cast("double")),
        histogram_agg(F.col("n_tok").cast("double"), LO, HI, NB),
    )


def test_histogram_matches_pandas(spark, corpus):
    got = {
        (r["source"], r["bucket_start"]): np.array(r["hist_v"])
        for r in _agg_1h(corpus).collect()
    }
    pdf = corpus.select("source", "ts", "n_tok").toPandas()
    pdf["bucket_start"] = pdf["ts"].dt.floor("1h")
    for (src, b), grp in pdf.groupby(["source", "bucket_start"]):
        exp = _pd_hist(grp["n_tok"].to_numpy(float))
        assert (got[(src, b)] == exp).all(), (src, b)
        assert got[(src, b)].sum() == len(grp)


def test_histogram_reaggregates_exactly(spark, corpus):
    t5 = corpus.groupBy(
        "source", F.window("ts", "5 minutes")["start"].alias("bucket_start")
    ).agg(histogram_agg(F.col("n_tok").cast("double"), LO, HI, NB))
    re1h = t5.groupBy(
        "source", F.date_trunc("hour", "bucket_start").alias("bucket_start")
    ).agg(histogram_reagg(NB))
    direct = _agg_1h(corpus).select("source", "bucket_start", "hist_v")
    a = {
        (r["source"], r["bucket_start"]): tuple(r["hist_v"])
        for r in re1h.collect()
    }
    b = {
        (r["source"], r["bucket_start"]): tuple(r["hist_v"])
        for r in direct.collect()
    }
    assert a == b


def test_histogram_folds_through_incremental_merge(spark, corpus):
    base = corpus.filter(F.xxhash64("doc_id") % 4 != 0)
    delta = corpus.filter(F.xxhash64("doc_id") % 4 == 0)
    merged = merge_partials(
        _agg_1h(base),
        _agg_1h(delta),
        ["source", "bucket_start"],
        hist=("hist_v", NB),
    )
    a = {
        (r["source"], r["bucket_start"]): tuple(r["hist_v"])
        for r in merged.collect()
    }
    b = {
        (r["source"], r["bucket_start"]): tuple(r["hist_v"])
        for r in _agg_1h(corpus).collect()
    }
    assert a == b


def test_percentile_within_bin_width(spark, corpus):
    w = (HI - LO) / NB
    rows = (
        corpus.groupBy("source")
        .agg(histogram_agg(F.col("n_tok").cast("double"), LO, HI, NB))
        .select(
            "source",
            *[
                hist_percentile("hist_v", q, LO, HI, NB).alias(f"p{int(q*100)}")
                for q in (0.5, 0.95)
            ],
        )
        .collect()
    )
    pdf = corpus.select("source", "n_tok").toPandas()
    for r in rows:
        vals = pdf[pdf.source == r["source"]]["n_tok"].to_numpy(float)
        for q, col in ((0.5, "p50"), (0.95, "p95")):
            exact = np.quantile(vals, q)
            assert abs(r[col] - exact) <= w + 1e-9, (r["source"], q, r[col], exact)


def test_percentile_empty_histogram_is_null(spark):
    df = spark.createDataFrame([([0] * NB,)], f"hist_v array<long>")
    assert df.select(hist_percentile("hist_v", 0.5, LO, HI, NB)).collect()[0][0] is None
