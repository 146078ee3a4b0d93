"""Cleaner oracles — outlier mask/drop, dense-spine gap-fill, and linear
interpolation vs pandas interpolate(method='linear')
(reference app/plugins/plugin_cleaner.py:83-140)."""

import numpy as np
import pandas as pd
import pytest

from preprocessor_spark.operators.cleaner import Cleaner, interpolate_linear

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def gappy_pdf():
    n = 300
    ts = pd.date_range("2020-01-01", periods=n, freq="min")
    v = RNG.normal(50, 2, n)
    pdf = pd.DataFrame({"ts": ts, "source": "s0", "v": v})
    # punch gaps: drop ~10% of rows to create missing timestamps
    keep = RNG.uniform(size=n) > 0.1
    keep[0] = keep[-1] = True
    return pdf[keep].reset_index(drop=True)


def test_gap_fill_produces_dense_spine(spark, gappy_pdf):
    df = spark.createDataFrame(gappy_pdf)
    cl = Cleaner(period_minutes=1, series_cols=["source"], value_cols=["v"])
    filled = cl.gap_fill(df).toPandas().sort_values("ts")
    expected = pd.date_range(gappy_pdf["ts"].min(), gappy_pdf["ts"].max(), freq="min")
    assert len(filled) == len(expected)
    assert (filled["ts"].values == expected.values).all()
    n_missing = len(expected) - len(gappy_pdf)
    assert filled["v"].isna().sum() == n_missing


def test_interpolation_matches_pandas(spark, gappy_pdf):
    df = spark.createDataFrame(gappy_pdf)
    cl = Cleaner(period_minutes=1, series_cols=["source"], value_cols=["v"])
    out = cl.interpolate(cl.gap_fill(df)).toPandas().sort_values("ts")

    dense = pd.date_range(gappy_pdf["ts"].min(), gappy_pdf["ts"].max(), freq="min")
    ref = gappy_pdf.set_index("ts").reindex(dense)
    ref["v"] = ref["v"].interpolate(method="linear")
    np.testing.assert_allclose(out["v"].values, ref["v"].values, atol=1e-10)


def test_interpolation_leading_and_trailing_nulls(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2020-01-01", periods=7, freq="min"),
            "source": "s0",
            "v": [None, 10.0, None, None, 40.0, None, None],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        interpolate_linear(df, ["v"], "ts", ["source"])
        .toPandas()
        .sort_values("ts")["v"]
        .values
    )
    # pandas default: leading stays NaN, interior linear, trailing ffilled
    expected = pdf["v"].astype(float).interpolate(method="linear").values
    np.testing.assert_allclose(out[1:], expected[1:], atol=1e-12)
    assert np.isnan(out[0]) and np.isnan(expected[0])


def test_outlier_mask_and_drop(spark):
    n = 200
    v = RNG.normal(0, 1, n)
    v[10] = 100.0  # gross outlier
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=n, freq="min"), "source": "s0", "v": v}
    )
    df = spark.createDataFrame(pdf)
    cl = Cleaner(outlier_threshold=3.0, series_cols=["source"], value_cols=["v"])

    masked = cl.mask_outliers(df).toPandas().sort_values("ts")
    mu, sd = pdf["v"].mean(), pdf["v"].std(ddof=1)
    expected_mask = (pdf["v"] - mu).abs() > 3.0 * sd
    assert masked["v"].isna().sum() == int(expected_mask.sum()) >= 1

    dropped = cl.drop_outliers(df)
    assert dropped.count() == n - int(expected_mask.sum())


def test_gap_fill_keeps_off_grid_rows(spark):
    """Facts whose timestamps are off the min(ts)+k*period grid must
    survive gap-fill (the reference INSERTS stamps into the frame): the
    old spine-left-join silently dropped them and interpolation bridged
    the hole as if the observation never existed."""
    import datetime as dt

    from preprocessor_spark.operators.cleaner import Cleaner

    t0 = dt.datetime(2020, 1, 1)
    rows = [
        (t0, 1.0),
        (t0 + dt.timedelta(minutes=2, seconds=30), 99.0),  # off-grid
        (t0 + dt.timedelta(minutes=5), 5.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    cl = Cleaner(period_minutes=5, time_col="ts")
    filled = cl.gap_fill(df)
    got = {(r["ts"], r["v"]) for r in filled.collect()}
    assert (t0 + dt.timedelta(minutes=2, seconds=30), 99.0) in got
    assert (t0, 1.0) in got and (t0 + dt.timedelta(minutes=5), 5.0) in got


def test_cleaner_threads_tiebreaks_into_interpolation(spark):
    """Duplicate timestamps within a series need an explicit tiebreak or
    the interpolation neighbor choice is partition-order-dependent."""
    import datetime as dt

    from preprocessor_spark.operators.cleaner import Cleaner

    t0 = dt.datetime(2020, 1, 1)
    rows = [
        (t0, "a", 10.0),
        (t0, "b", None),
        (t0 + dt.timedelta(minutes=1), "c", 20.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    cl = Cleaner(time_col="ts", tiebreak_cols=["k"], value_cols=["v"])
    out = {r["k"]: r["v"] for r in cl.interpolate(df).collect()}
    # with tiebreak k: order is a(10), b(null), c(20) → b = 15 exactly,
    # at ANY parallelism
    assert out["b"] == 15.0
