"""Normalizer oracles — mirrors reference tests/test_normalization_handler.py:
train-only fit, zero-variance handling, denormalization round-trip, and the
1e-10 numpy-oracle tolerance (tests/test_preprocessor_core_integration.py:171-172).
"""

import numpy as np
import pandas as pd
import pytest

from preprocessor_spark.operators.normalizer import Normalizer

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def pdf():
    n = 500
    return pd.DataFrame(
        {
            "a": RNG.normal(10.0, 3.0, n),
            "b": RNG.uniform(-5.0, 5.0, n),
            "const": np.full(n, 7.0),  # zero-variance feature
            "label": [f"r{i}" for i in range(n)],  # non-numeric passthrough
        }
    )


def test_zscore_matches_pandas_oracle(spark, pdf):
    df = spark.createDataFrame(pdf)
    norm = Normalizer(method="zscore")
    params = norm.fit(df)
    out = norm.transform(df, params).toPandas().sort_values("label")
    ref = pdf.sort_values("label")
    for c in ("a", "b"):
        expected = (ref[c] - ref[c].mean()) / ref[c].std(ddof=1)
        np.testing.assert_allclose(out[c].values, expected.values, atol=1e-10)


def test_zero_variance_std_is_one(spark, pdf):
    # reference app/core/normalization_handler.py:160-165: constant → std 1.0
    df = spark.createDataFrame(pdf)
    norm = Normalizer(method="zscore")
    params = norm.fit(df)
    assert params.params["per_column"]["const"]["std"] == 1.0
    out = norm.transform(df, params).toPandas()
    np.testing.assert_allclose(out["const"].values, 0.0, atol=1e-12)


def test_minmax_default_plugin_epsilon(spark, pdf):
    # reference app/plugins/plugin_default.py:174-176: (x-min)/(max-min+1e-8)
    df = spark.createDataFrame(pdf)
    norm = Normalizer(method="minmax", feature_range=(0.0, 1.0), epsilon=1e-8)
    params = norm.fit(df)
    out = norm.transform(df, params).toPandas().sort_values("label")
    ref = pdf.sort_values("label")
    for c in ("a", "b"):
        expected = (ref[c] - ref[c].min()) / (ref[c].max() - ref[c].min() + 1e-8)
        np.testing.assert_allclose(out[c].values, expected.values, atol=1e-10)


def test_minmax_plugin_range(spark, pdf):
    # reference app/plugins/plugin_normalizer.py:158,175: range (-1, 1)
    df = spark.createDataFrame(pdf)
    norm = Normalizer(method="minmax", feature_range=(-1.0, 1.0))
    params = norm.fit(df)
    out = norm.transform(df, params).toPandas()
    assert out["a"].min() >= -1.0 - 1e-12 and out["a"].max() <= 1.0 + 1e-12


def test_denormalize_roundtrip(spark, pdf):
    # reference tests/test_normalization_handler.py:702-740 denorm accuracy
    df = spark.createDataFrame(pdf)
    for method, eps in (("zscore", 0.0), ("minmax", 1e-8)):
        norm = Normalizer(method=method, epsilon=eps)
        params = norm.fit(df)
        out = norm.inverse_transform(norm.transform(df, params), params)
        back = out.toPandas().sort_values("label")
        ref = pdf.sort_values("label")
        for c in ("a", "b"):
            np.testing.assert_allclose(back[c].values, ref[c].values, atol=1e-8)


def test_train_only_fit_applied_to_all(spark, pdf):
    # fit on a slice, apply everywhere (app/core/preprocessor_core.py:433-494)
    df = spark.createDataFrame(pdf)
    train = df.limit(200)
    norm = Normalizer(method="zscore", columns=["a"])
    params = norm.fit(train)
    tp = train.toPandas()
    np.testing.assert_allclose(
        params.params["per_column"]["a"]["mean"], tp["a"].mean(), atol=1e-10
    )
    assert params.n_samples == 200
    out = norm.transform(df, params)
    assert out.count() == 500


def test_params_persistence_roundtrip(tmp_path, spark, pdf):
    from preprocessor_spark.params import load_params, save_params

    df = spark.createDataFrame(pdf)
    params = Normalizer(method="zscore").fit(df)
    p = str(tmp_path / "norm.json")
    save_params(p, params)
    loaded = load_params(p)
    assert loaded.params == params.params
    assert loaded.to_dict()["checksum"] == params.to_dict()["checksum"]


def test_params_dual_file_reference_layout(tmp_path, spark, pdf):
    """Reference-artifact compatibility: the dual means.json/stds.json
    layout (app/core/normalization_handler.py:299-359) round-trips through
    the engine, matches the reference's md5-of-sorted-JSON checksum, and
    the reference's load-side validation (cross-file checksum/timestamp
    agreement, integrity recompute) is enforced."""
    import hashlib as hl
    import json as js

    from preprocessor_spark.params import load_params_dual, save_params_dual

    df = spark.createDataFrame(pdf)
    params = Normalizer(method="zscore", columns=["a", "b"]).fit(df)
    save_params_dual(str(tmp_path), params, timestamp="2026-01-01T00:00:00")

    means_data = js.load(open(tmp_path / "means.json"))
    stds_data = js.load(open(tmp_path / "stds.json"))
    # independent recomputation of the reference checksum formula
    expect = hl.md5(
        js.dumps(
            {
                "means": means_data["means"],
                "stds": stds_data["stds"],
                "features": sorted(means_data["means"]),
            },
            sort_keys=True,
        ).encode()
    ).hexdigest()
    assert means_data["metadata"]["checksum"] == expect
    assert stds_data["metadata"]["checksum"] == expect
    assert means_data["metadata"]["sample_count"] == params.n_samples

    loaded = load_params_dual(str(tmp_path))
    for c in ("a", "b"):
        assert (
            loaded.params["per_column"][c] == params.params["per_column"][c]
        )
    # the loaded params drive an identical transform
    a = Normalizer(method="zscore", columns=["a", "b"]).transform(df, params)
    b = Normalizer(method="zscore", columns=["a", "b"]).transform(df, loaded)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # tampering with one file must fail the reference validation contract
    stds_data["stds"]["a"] = stds_data["stds"]["a"] + 1.0
    js.dump(stds_data, open(tmp_path / "stds.json", "w"))
    import pytest as pt

    with pt.raises(IOError):
        load_params_dual(str(tmp_path))


def test_params_dual_rejects_nonpositive_std(tmp_path):
    """Reference parity: NormalizationParameters raises on std <= 0
    (app/core/normalization_handler.py parameter validation). A
    hand-authored zero std must fail at LOAD, not as inf/NaN in the
    subsequent zscore transform (loaded epsilon is 0.0)."""
    import json as js

    import pytest as pt

    from preprocessor_spark.params import _dual_checksum, load_params_dual

    means = {"a": 1.0, "b": 2.0}
    stds = {"a": 0.0, "b": 1.5}
    meta = {
        "computation_timestamp": "2026-01-01T00:00:00",
        "source_datasets": ["d1"],
        "feature_count": 2,
        "sample_count": 10,
        "checksum": _dual_checksum(means, stds),
    }
    js.dump(
        {"metadata": meta, "means": means}, open(tmp_path / "means.json", "w")
    )
    js.dump(
        {"metadata": meta, "stds": stds}, open(tmp_path / "stds.json", "w")
    )
    with pt.raises(ValueError, match="non-positive or non-finite std"):
        load_params_dual(str(tmp_path))


def test_params_dual_rejects_infinite_std(tmp_path):
    """Reference parity (normalization_handler.py:173): non-FINITE stds
    are rejected too — a hand-authored inf std would otherwise silently
    zero every zscore output instead of failing at load."""
    import json as js

    import pytest as pt

    from preprocessor_spark.params import _dual_checksum, load_params_dual

    means = {"a": 1.0}
    stds = {"a": float("inf")}
    meta = {
        "computation_timestamp": "2026-01-01T00:00:00",
        "source_datasets": ["d1"],
        "feature_count": 1,
        "sample_count": 10,
        "checksum": _dual_checksum(means, stds),
    }
    js.dump(
        {"metadata": meta, "means": means}, open(tmp_path / "means.json", "w")
    )
    js.dump(
        {"metadata": meta, "stds": stds}, open(tmp_path / "stds.json", "w")
    )
    with pt.raises(ValueError, match="non-positive or non-finite std"):
        load_params_dual(str(tmp_path))


def test_pip_mae_minmax_all_null_column(spark):
    """minmax params fitted over an all-null column store min=max=None:
    the pip diagnostic must report None for it (the rng==0 convention),
    not crash on None - None."""
    from pyspark.sql import functions as F

    from preprocessor_spark.operators.normalizer import Normalizer

    df = spark.range(5).select(
        F.col("id").cast("double").alias("x"),
        F.lit(None).cast("double").alias("y"),
    )
    norm = Normalizer(method="minmax", columns=["x", "y"])
    params = norm.fit(df)
    diag = Normalizer.pip_mae_diagnostics(params)
    assert diag["y"] is None
    assert diag["x"] is not None and diag["x"] > 0


def test_dual_params_refuse_nan_statistics(tmp_path):
    """A NaN fit statistic must be refused loudly at save time: bare NaN
    is not standard JSON (breaking the reference-layout interop), and the
    read-back dict verify would otherwise fail with a misleading
    'mismatch' (NaN != NaN)."""
    import pytest as pt

    from preprocessor_spark.params import StageParams, save_params_dual

    sp = StageParams(
        stage="normalizer",
        method="zscore",
        params={
            "columns": ["x"],
            "per_column": {"x": {"mean": float("nan"), "std": 1.0}},
            "feature_range": (-1, 1),
        },
    )
    with pt.raises(ValueError, match="non-finite"):
        save_params_dual(str(tmp_path), sp)
