"""Unbiaser oracles — MA residuals vs pandas rolling(min_periods=1) and EMA
residuals BIT-EXACT vs pandas ewm (the reference's own implementation,
app/plugins/plugin_unbiaser.py:89-129)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
import pytest

from preprocessor_spark.operators.unbiaser import Unbiaser

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def series_pdf():
    n = 400
    ts = pd.date_range("2020-01-01", periods=n, freq="min")
    return pd.DataFrame(
        {
            "ts": list(ts) * 2,
            "source": ["s0"] * n + ["s1"] * n,
            "v": np.concatenate(
                [RNG.normal(100, 5, n).cumsum() / 50, RNG.normal(0, 1, n)]
            ),
        }
    )


def _ref_ma(x: pd.Series, w: int) -> pd.Series:
    # reference loop semantics (plugin_unbiaser.py:103-107): trailing window
    # incl. current row, partial at head == rolling(w, min_periods=1).mean()
    return x - x.rolling(window=w, min_periods=1).mean()


def test_ma_unbias_matches_reference(spark, series_pdf):
    df = spark.createDataFrame(series_pdf)
    out = (
        Unbiaser(method="ma", window_size=5, series_cols=["source"], value_cols=["v"])
        .transform(df)
        .toPandas()
        .sort_values(["source", "ts"])
    )
    for src, grp in series_pdf.groupby("source"):
        expected = _ref_ma(grp.sort_values("ts")["v"], 5)
        got = out[out["source"] == src]["v"]
        np.testing.assert_allclose(got.values, expected.values, atol=1e-10)


def test_ma_partial_leading_windows(spark):
    # first row residual must be exactly 0 (window = itself)
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2020-01-01", periods=6, freq="min"),
            "source": ["s0"] * 6,
            "v": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        Unbiaser(method="ma", window_size=3, series_cols=["source"], value_cols=["v"])
        .transform(df)
        .toPandas()
        .sort_values("ts")["v"]
        .values
    )
    np.testing.assert_allclose(out, [0.0, 5.0, 10.0, 10.0, 10.0, 10.0], atol=1e-12)


def test_ema_bitexact_vs_pandas(spark, series_pdf):
    df = spark.createDataFrame(series_pdf).repartition(4)
    out = (
        Unbiaser(method="ema", ema_alpha=0.1, series_cols=["source"], value_cols=["v"])
        .transform(df)
        .toPandas()
        .sort_values(["source", "ts"])
    )
    for src, grp in series_pdf.groupby("source"):
        x = grp.sort_values("ts")["v"]
        expected = x - x.ewm(alpha=0.1, adjust=True).mean()
        got = out[out["source"] == src]["v"]
        # bit-exact: same pandas ewm kernel runs inside applyInPandas
        assert np.array_equal(got.values, expected.values)


def test_ma_chunked_equals_plain(spark):
    """Scale-path chunked MA must be bit-identical to the plain window,
    including across time gaps (dense positional chunking)."""
    import numpy as np
    from preprocessor_spark.synth import token_sequences

    corpus = token_sequences(spark, 20000).withColumn(
        "v", F.col("n_tok").cast("double")
    )
    kw = dict(
        method="ma",
        window_size=5,
        series_cols=["source"],
        value_cols=["v"],
        tiebreak_cols=["doc_id"],
    )
    plain = (
        Unbiaser(**kw)
        .transform(corpus)
        .select("doc_id", "v")
        .toPandas()
        .sort_values("doc_id")
    )
    chunked = (
        Unbiaser(**kw, chunk_rows=500)
        .transform(corpus)
        .select("doc_id", "v")
        .toPandas()
        .sort_values("doc_id")
    )
    assert len(plain) == len(chunked)
    assert np.array_equal(plain["v"].values, chunked["v"].values)


def test_ema_chunked_matches_pandas(spark):
    """Chunked-carry EMA scale path ≈ single-pass pandas ewm (1e-10 rel;
    chunk seams reorder float summation so bit-exactness isn't claimed —
    the default per-series path stays bit-exact)."""
    import numpy as np
    from preprocessor_spark.synth import token_sequences

    corpus = token_sequences(spark, 6000).withColumn(
        "v", F.col("n_tok").cast("double")
    )
    kw = dict(
        method="ema",
        ema_alpha=0.1,
        series_cols=["source"],
        value_cols=["v"],
        tiebreak_cols=["doc_id"],
    )
    exact = (
        Unbiaser(**kw)
        .transform(corpus)
        .select("doc_id", "v")
        .toPandas()
        .sort_values("doc_id")
    )
    chunked = (
        Unbiaser(**kw, chunk_rows=300)
        .transform(corpus)
        .select("doc_id", "v")
        .toPandas()
        .sort_values("doc_id")
    )
    assert len(exact) == len(chunked)
    np.testing.assert_allclose(
        chunked["v"].values, exact["v"].values, rtol=1e-10, atol=1e-12
    )


def test_ma_chunked_plan_has_single_exchange(spark):
    """The chunked MA scale path must cost exactly ONE full-width shuffle:
    chunk ids come from driver-side bucket packing + a broadcast join, not
    from a positions window (which added a second Exchange)."""
    from preprocessor_spark.synth import token_sequences

    corpus = token_sequences(spark, 5000).withColumn(
        "v", F.col("n_tok").cast("double")
    )
    out = Unbiaser(
        method="ma",
        window_size=5,
        series_cols=["source"],
        value_cols=["v"],
        tiebreak_cols=["doc_id"],
        chunk_rows=300,
    ).transform(corpus)
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}:\n{plan}"
    assert "BroadcastExchange" in plan  # the chunk-assignment join


def test_ma_chunked_tail_spans_buckets(spark):
    """Window larger than single-bucket counts: the tail suffix must span
    multiple buckets and stay exact."""
    import numpy as np
    import pandas as pd

    n = 400
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2020-01-01", periods=n, freq="s"),
            "doc_id": [f"d{i:05d}" for i in range(n)],
            "v": np.random.default_rng(5).normal(size=n),
        }
    )
    df = spark.createDataFrame(pdf)
    kw = dict(method="ma", window_size=60, value_cols=["v"], tiebreak_cols=["doc_id"])
    plain = (
        Unbiaser(**kw).transform(df).select("doc_id", "v").toPandas().sort_values("doc_id")
    )
    chunked = (
        Unbiaser(**kw, chunk_rows=50)
        .transform(df)
        .select("doc_id", "v")
        .toPandas()
        .sort_values("doc_id")
    )
    assert np.array_equal(plain["v"].values, chunked["v"].values)


def test_ema_integer_value_columns_yield_double_residuals(spark):
    """EMA residuals are fractional: reusing the input schema for the
    pandas path made integer value columns an Arrow unsafe cast (error, or
    silent truncation with safe checks off) and disagreed with MA, which
    yields doubles. Both EMA paths must promote ints to double."""
    import pandas as pd
    import pyspark.sql.functions as F

    from preprocessor_spark.operators.unbiaser import Unbiaser

    df = spark.createDataFrame(
        [(i, (i * 7) % 13) for i in range(40)], "ts bigint, v int"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    s = pd.Series([(i * 7) % 13 for i in range(40)], dtype=float)
    for chunk in (None, 11):
        u = Unbiaser(
            method="ema", value_cols=["v"], tiebreak_cols=[], chunk_rows=chunk
        )
        out = u.transform(df)
        assert dict(out.dtypes)["v"] == "double"
        got = [r["v"] for r in out.orderBy("ts").collect()]
        exp = (s - s.ewm(alpha=u.ema_alpha, adjust=True).mean()).tolist()
        assert max(abs(a - b) for a, b in zip(got, exp)) < 1e-9


def test_ema_chunked_keeps_null_series_keys(spark):
    """A null series key is a legitimate group: the chunked scale path's
    carry join must be null-safe, or every null-keyed row silently
    vanishes from the output while the default path returns them."""
    import numpy as np
    from preprocessor_spark.synth import token_sequences

    corpus = (
        token_sequences(spark, 4000)
        .withColumn(
            "source",
            F.when(F.col("source") == "s1", F.lit(None)).otherwise(
                F.col("source")
            ),
        )
        .withColumn("v", F.col("n_tok").cast("double"))
    )
    n_null = corpus.filter(F.col("source").isNull()).count()
    assert n_null > 0
    kw = dict(
        method="ema",
        ema_alpha=0.1,
        series_cols=["source"],
        value_cols=["v"],
        tiebreak_cols=["doc_id"],
    )
    exact = (
        Unbiaser(**kw).transform(corpus).select("doc_id", "v").toPandas()
    ).sort_values("doc_id")
    chunked = (
        Unbiaser(**kw, chunk_rows=300)
        .transform(corpus)
        .select("doc_id", "v")
        .toPandas()
    ).sort_values("doc_id")
    assert len(chunked) == len(exact) == corpus.count()
    np.testing.assert_allclose(
        chunked["v"].values, exact["v"].values, rtol=1e-10, atol=1e-12
    )
