"""Feature selectors (P5/F1/F4/lag-corr), P4 column contract, M5/M7 utils,
W10 three-way split."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from preprocessor_spark.operators.feature_selector import (
    FeatureSelector,
    boruta_select,
    lasso_select,
)
from preprocessor_spark.operators.splitter import TemporalSplitter
from preprocessor_spark.operators.trimmer import Trimmer, require_columns

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def supervised_pdf():
    n = 1500
    x1 = RNG.normal(0, 1, n)
    x2 = RNG.normal(0, 1, n)
    noise = RNG.normal(0, 1, n)
    y = 3.0 * x1 + 0.5 * x2 + RNG.normal(0, 0.1, n)
    return pd.DataFrame({"x1": x1, "x2": x2, "noise": noise, "y": y})


def test_select_multi_and_params_roundtrip(spark, supervised_pdf, tmp_path):
    from preprocessor_spark.params import load_params, save_params

    df = spark.createDataFrame(supervised_pdf)
    fs = FeatureSelector(method="select_multi", names=["x1", "y"], keep_cols=[])
    params = fs.fit(df)
    save_params(str(tmp_path / "sel.json"), params)
    out = fs.transform(df, load_params(str(tmp_path / "sel.json")))
    assert out.columns == ["x1", "y"]


def test_lasso_select_finds_informative(spark, supervised_pdf):
    df = spark.createDataFrame(supervised_pdf)
    sel = lasso_select(df, ["x1", "x2", "noise"], "y", alpha=0.05)
    assert "x1" in sel
    assert "noise" not in sel


def test_boruta_select_rejects_noise(spark, supervised_pdf):
    df = spark.createDataFrame(supervised_pdf)
    sel = boruta_select(
        df, ["x1", "x2", "noise"], "y", n_iterations=3, num_trees=20
    )
    assert "x1" in sel
    assert "noise" not in sel


def test_lag_corr_screen(spark):
    n = 400
    ts = pd.date_range("2020-01-01", periods=n, freq="h")
    trending = np.cumsum(RNG.normal(0, 1, n))  # strongly autocorrelated
    white = RNG.normal(0, 1, n)  # ~no autocorrelation
    pdf = pd.DataFrame({"ts": ts, "trending": trending, "white": white})
    df = spark.createDataFrame(pdf)
    fs = FeatureSelector(method="lag_corr", keep_cols=["ts"], lag_corr_threshold=0.5)
    params = fs.fit(df)
    assert "trending" in params.params["selected_features"]
    assert "white" not in params.params["selected_features"]


def test_lag_corr_chunked_matches_global(spark):
    """The chunked lag window (multiple chunks forced via tiny
    lag_chunk_rows) must select exactly what pandas' global autocorr
    math does — the carried tails make chunk-boundary lag pairs exact —
    and its plan must contain no empty-partition Window."""
    n = 600
    ts = pd.date_range("2020-01-01", periods=n, freq="h")
    trending = np.cumsum(RNG.normal(0, 1, n))
    white = RNG.normal(0, 1, n)
    pdf = pd.DataFrame({"ts": ts, "trending": trending, "white": white})
    df = spark.createDataFrame(pdf).repartition(8)
    max_lag = 5
    fs = FeatureSelector(
        method="lag_corr",
        keep_cols=["ts"],
        lag_corr_threshold=0.5,
        max_lag=max_lag,
        lag_chunk_rows=100,  # 600 rows → ≥6 chunks: boundaries exercised
    )
    sel = set(fs.fit(df).params["selected_features"])
    # pandas oracle: same |corr(x, lag_k x)| screen on the globally
    # ordered series
    expected = set()
    spdf = pdf.sort_values("ts")
    for c in ("trending", "white"):
        if any(
            abs(spdf[c].corr(spdf[c].shift(k))) > 0.5
            for k in range(1, max_lag + 1)
        ):
            expected.add(c)
    assert sel == expected == {"trending"}


def test_require_columns(spark):
    df = spark.createDataFrame(pd.DataFrame({"b": [1], "a": [2], "c": [3]}))
    out = require_columns(df, ["a", "b"], strict=False)
    assert out.columns == ["a", "b", "c"]
    with pytest.raises(ValueError, match="missing"):
        require_columns(df, ["a", "zzz"])


def test_trimmer_positional_and_columns(spark):
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=10, freq="min"), "v": range(10), "x": 1}
    )
    df = spark.createDataFrame(pdf)
    t = Trimmer(columns=[2], rows=[0, 5], order_col="ts")
    out = t.transform(df).toPandas().sort_values("ts")
    assert "x" not in out.columns
    assert list(out["v"]) == [1, 2, 3, 4, 6, 7, 8, 9]


def test_trimmer_positional_distributed_no_global_window(spark):
    """The time-keyed positional drop must take the distributed-positions
    path: same rows as the ordered-window fallback, and NO empty-partition
    Window (single-partition sort) anywhere in the plan."""
    n = 500
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2021-03-01", periods=n, freq="min"),
            "v": RNG.normal(0, 1, n),
        }
    )
    df = spark.createDataFrame(pdf).repartition(8)
    rows = [0, 7, 123, 499]
    t = Trimmer(rows=rows, order_col="ts")
    out = t.transform(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # grouped_positions windows BY the value bucket; its Window node prints
    # three top-level bracket groups ("[exprs], [partition], [order]") while
    # a global window prints only two ("[exprs], [order]") — assert every
    # Window node in the plan carries a partition spec
    for line in plan.splitlines():
        if "Window [" in line:
            assert line.count("], [") >= 2, f"global window in plan: {line}"
    kept = out.toPandas().sort_values("ts")["v"].to_numpy()
    expected = pdf.drop(index=rows).sort_values("ts")["v"].to_numpy()
    assert np.allclose(kept, expected)


def test_trimmer_positional_null_order_keys(spark):
    """NULL order keys must position FIRST (Spark ORDER BY ASC is NULLS
    FIRST) on the distributed path, and an all-null key column must still
    yield dense distinct positions — rows=[0] drops exactly one row, not
    the whole table."""
    # mixed nulls: the two null-ts rows occupy positions 0 and 1
    pdf = pd.DataFrame(
        {
            "ts": [pd.NaT, pd.NaT] + list(pd.date_range("2022-01-01", periods=6, freq="h")),
            "v": range(8),
        }
    )
    df = spark.createDataFrame(pdf).repartition(4)
    out = Trimmer(rows=[0, 1], order_col="ts").transform(df).toPandas()
    assert len(out) == 6
    assert out["ts"].notna().all()  # exactly the null-key rows dropped
    # all-null keys: still one distinct position per row
    pdf2 = pd.DataFrame({"ts": [pd.NaT] * 5, "v": range(5)})
    out2 = Trimmer(rows=[0], order_col="ts").transform(
        spark.createDataFrame(pdf2)
    )
    assert out2.count() == 4


def test_mutual_information_keeps_all_features_on_empty(spark):
    """Fused MI must keep the old per-feature contract: one output row per
    requested feature (null mi_bits) even when the input is empty."""
    from preprocessor_spark.functions.analysis import mutual_information

    pdf = pd.DataFrame({"a": [1.0], "b": [2.0], "y": [3.0]})
    df = spark.createDataFrame(pdf).filter(F.lit(False))
    out = mutual_information(df, ["a", "b"], "y").toPandas()
    assert sorted(out["feature"]) == ["a", "b"]
    assert out["mi_bits"].isna().all()


def test_trimmer_positional_string_order_fallback(spark):
    """Non-bucketable (string) order keys take the ordered-window fallback
    and still drop exactly the requested 0-based positions."""
    pdf = pd.DataFrame({"k": [f"id_{i:03d}" for i in range(10)], "v": range(10)})
    df = spark.createDataFrame(pdf)
    out = Trimmer(rows=[0, 5], order_col="k").transform(df).toPandas()
    assert sorted(out["v"]) == [1, 2, 3, 4, 6, 7, 8, 9]


def test_pip_mae_diagnostics(spark):
    from preprocessor_spark.operators.normalizer import Normalizer

    pdf = pd.DataFrame({"close": RNG.normal(1.1, 0.01, 500)})
    df = spark.createDataFrame(pdf)
    norm = Normalizer(method="zscore")
    params = norm.fit(df)
    diag = Normalizer.pip_mae_diagnostics(params, pips=10)
    assert diag["close"] == pytest.approx(
        10 * 1e-4 / params.params["per_column"]["close"]["std"]
    )


def test_row_quality_flag(spark):
    from preprocessor_spark.operators.metadata import row_quality_flag

    pdf = pd.DataFrame({"a": [1.0, None, 3.0], "b": ["x", "y", None]})
    df = spark.createDataFrame(pdf)
    out = row_quality_flag(df).toPandas().sort_values("a", na_position="last")
    assert list(out["quality_flag"]) == [1, 0, 0]


def test_three_way_split(spark):
    n = 100
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=n, freq="min"), "v": range(n)}
    )
    df = spark.createDataFrame(pdf)
    sp = TemporalSplitter.three_way(0.2, 0.6)
    out = sp.transform(df).groupBy("split_id").count().collect()
    counts = {r["split_id"]: r["count"] for r in out}
    assert counts == {"d1": 20, "d2": 60, "d3": 20}


# -- F5 Granger causality ---------------------------------------------------


def test_betainc_closed_forms():
    from preprocessor_spark.operators.feature_selector import _betainc_reg, f_sf

    # I_x(1, b) = 1 - (1-x)^b exactly
    for b in (0.5, 1.0, 3.0, 10.0):
        for x in (0.01, 0.3, 0.7, 0.99):
            assert _betainc_reg(1.0, b, x) == pytest.approx(
                1.0 - (1.0 - x) ** b, abs=1e-12
            )
    # symmetry I_x(a,b) + I_{1-x}(b,a) = 1
    for a, b, x in [(2.5, 7.0, 0.2), (0.5, 0.5, 0.42), (6.0, 3.0, 0.8)]:
        assert _betainc_reg(a, b, x) + _betainc_reg(b, a, 1 - x) == pytest.approx(
            1.0, abs=1e-12
        )
    # arcsine median: I_0.5(0.5, 0.5) = 0.5
    assert _betainc_reg(0.5, 0.5, 0.5) == pytest.approx(0.5, abs=1e-12)
    # F(2, d2) survival has the closed form (1 + 2f/d2)^(-d2/2)
    for d2 in (4, 10, 30):
        for f in (0.5, 1.0, 3.0, 10.0):
            assert f_sf(f, 2, d2) == pytest.approx(
                (1.0 + 2.0 * f / d2) ** (-d2 / 2.0), rel=1e-10
            )
    assert f_sf(0.0, 5, 10) == 1.0
    assert f_sf(1e6, 5, 10) < 1e-9


def _granger_numpy_oracle(pdf, feature, target, max_lag):
    """Same nested-model F-test with explicit numpy lag matrices."""
    y = pdf[target].to_numpy()
    x = pdf[feature].to_numpy()
    n_all = len(y)
    rows = []
    for t in range(max_lag, n_all):
        rows.append(
            (
                y[t],
                [1.0]
                + [y[t - k] for k in range(1, max_lag + 1)]
                + [x[t - k] for k in range(1, max_lag + 1)],
            )
        )
    yt = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows])
    Xr = X[:, : max_lag + 1]
    br = np.linalg.lstsq(Xr, yt, rcond=None)[0]
    bu = np.linalg.lstsq(X, yt, rcond=None)[0]
    rss_r = float(((yt - Xr @ br) ** 2).sum())
    rss_u = float(((yt - X @ bu) ** 2).sum())
    dof = len(yt) - (2 * max_lag + 1)
    return ((rss_r - rss_u) / max_lag) / (rss_u / dof)


def test_granger_select_matches_numpy_oracle(spark):
    from preprocessor_spark.operators.feature_selector import f_sf, granger_select

    n, L = 400, 3
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, n)
    z = rng.normal(0, 1, n)  # independent — must not be selected
    y = np.zeros(n)
    for t in range(1, n):
        y[t] = 0.4 * y[t - 1] + (0.8 * x[t - 3] if t >= 3 else 0.0) + rng.normal(
            0, 0.3
        )
    pdf = pd.DataFrame({"t": np.arange(n), "y": y, "x": x, "z": z})
    df = spark.createDataFrame(pdf)
    selected, stats = granger_select(
        df, ["x", "z"], "y", "t", max_lag=L, return_stats=True
    )
    assert selected == ["x"]
    assert stats["x"]["p_value"] < 1e-6
    assert stats["z"]["p_value"] > 0.05
    assert stats["x"]["n"] == n - L
    for feat in ("x", "z"):
        f_ref = _granger_numpy_oracle(pdf.sort_values("t"), feat, "y", L)
        assert stats[feat]["f_stat"] == pytest.approx(f_ref, rel=1e-6)
        assert stats[feat]["p_value"] == pytest.approx(
            f_sf(f_ref, L, (n - L) - (2 * L + 1)), rel=1e-6, abs=1e-12
        )


def test_granger_select_parallelism_and_chunk_invariant(spark):
    """The chunked lag pass must reproduce the global-window lag pairs at
    any parallelism and chunk size (carry machinery exactness)."""
    from preprocessor_spark.operators.feature_selector import granger_select

    n, L = 300, 2
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, n)
    y = np.concatenate([[0.0], 0.9 * x[:-1]]) + rng.normal(0, 0.1, n)
    pdf = pd.DataFrame({"t": np.arange(n), "y": y, "x": x})
    base = spark.createDataFrame(pdf)
    results = []
    for parts, chunk in [(1, 10**6), (8, 50), (3, 17)]:
        _, stats = granger_select(
            base.repartition(parts),
            ["x"],
            "y",
            "t",
            max_lag=L,
            chunk_rows=chunk,
            return_stats=True,
        )
        results.append(stats["x"]["f_stat"])
    assert results[0] == pytest.approx(results[1], rel=1e-9)
    assert results[0] == pytest.approx(results[2], rel=1e-9)


def test_granger_select_feature_group_fusion(spark):
    """>4 features exercises the multi-group (cached lag frame) path; the
    per-feature stats must not depend on which group a feature lands in."""
    from preprocessor_spark.operators.feature_selector import granger_select

    n, L = 250, 2
    rng = np.random.default_rng(23)
    cols = {f"f{i}": rng.normal(0, 1, n) for i in range(6)}
    y = np.concatenate([[0.0], 0.9 * cols["f5"][:-1]]) + rng.normal(0, 0.1, n)
    pdf = pd.DataFrame({"t": np.arange(n), "y": y, **cols})
    df = spark.createDataFrame(pdf)
    feats = [f"f{i}" for i in range(6)]
    sel_all, stats_all = granger_select(
        df, feats, "y", "t", max_lag=L, return_stats=True
    )
    assert "f5" in sel_all
    # same feature alone (single group) gives identical numbers
    _, stats_one = granger_select(df, ["f5"], "y", "t", max_lag=L, return_stats=True)
    assert stats_all["f5"]["f_stat"] == pytest.approx(
        stats_one["f5"]["f_stat"], rel=1e-9
    )


def test_lag_corr_requires_an_order_column(spark):
    """Without keep_cols there is no time key: ordering by the first value
    column would make every corr(x, lag(x)) ~1 (a screen that selects
    everything), so the selector must refuse instead."""
    import pytest as pt

    from preprocessor_spark.operators.feature_selector import FeatureSelector

    df = spark.createDataFrame(
        [(float(i), float(i * 2)) for i in range(50)], "x double, y double"
    )
    fs = FeatureSelector(method="lag_corr", keep_cols=[])
    with pt.raises(ValueError, match="order column"):
        fs.fit(df)


def test_selector_combines_names_and_indices_and_dedups_keep_cols(spark):
    """The CLI splits one --select-columns flag into digit indices and
    names and passes BOTH: `names or indices` silently discarded the
    indices. And a selected name that is also a keep_col must project
    once, not twice (AMBIGUOUS_REFERENCE downstream)."""
    from preprocessor_spark.operators.feature_selector import FeatureSelector

    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0, 4.0)], ["ts", "a", "b", "c"]
    )
    sel = FeatureSelector(names=["a"], indices=[2], keep_cols=["ts"])
    p = sel.fit(df)
    assert p.params["selected_features"] == ["a", "b"]
    out = sel.transform(df, p)
    assert out.columns == ["ts", "a", "b"]

    dup = FeatureSelector(names=["ts", "a"], keep_cols=["ts"])
    out2 = dup.transform(df, dup.fit(df))
    assert out2.columns == ["ts", "a"]  # 'ts' once, never twice


def test_trimmer_can_drop_order_column_and_rows_together(spark):
    """One call that drops BOTH the time column and rows used to die:
    positions were computed on the post-column-drop frame, which no longer
    carried the order key. Row selection is column-independent (pandas
    iloc semantics), so drops happen rows-first."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2020-01-01", periods=6, freq="min"),
            "a": range(6),
            "b": range(6),
        }
    )
    df = spark.createDataFrame(pdf)
    out = Trimmer(columns=[0], rows=[3], order_col="ts").transform(df)
    assert out.columns == ["a", "b"]
    assert sorted(r["a"] for r in out.collect()) == [0, 1, 2, 4, 5]


def test_positions_string_lead_falls_back_to_lexical_window(spark):
    """A numeric-looking STRING order key must position lexically (what
    ORDER BY does), not numerically: the value-bucket scale path would
    bucket '2' before '10' while the window sorts '10' first, scattering
    positions. Non-bucketable leads take a correct per-group window."""
    from preprocessor_spark.operators.positions import (
        grouped_positions_and_totals,
    )

    df = spark.createDataFrame(
        [("10",), ("2",), ("1",)], "k string"
    ).repartition(4)
    positioned, totals = grouped_positions_and_totals(df, ["k"])
    got = {r["k"]: r["__pos"] for r in positioned.collect()}
    assert got == {"1": 0, "10": 1, "2": 2}  # lexical, matching ORDER BY
    assert totals == {(): 3}
