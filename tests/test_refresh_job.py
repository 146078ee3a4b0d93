"""End-to-end tests for the incremental refresh job (plans/refresh_job.py):
refreshing a rollup_job output with appended deltas must reproduce the
tiers AND the prepared (z-scored + MA-unbiased) series of a full-corpus
rollup_job run under the same persisted params — the MA seam continuation
carries exactly, two chained refreshes work from the persisted tail, and
interior late data is refused (order-dependent stage)."""

import json
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from preprocessor_spark.plans import refresh_job, rollup_job
from preprocessor_spark.rollup.tiers import DEFAULT_TIERS
from preprocessor_spark.synth import token_sequences

TIER_COLS = ["source", "bucket_start", "n_points", "sum_v", "sum_sq", "min_v", "max_v"]
CUT1 = "2020-01-01 03:00:00"
CUT2 = "2020-01-01 03:40:00"


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    work = tmp_path_factory.mktemp("refresh_job")
    full = token_sequences(spark, 16_000)
    paths = {}
    for name, df in (
        ("full", full),
        ("base", full.filter(F.col("ts") < CUT1)),
        ("delta1", full.filter((F.col("ts") >= CUT1) & (F.col("ts") < CUT2))),
        ("delta2", full.filter(F.col("ts") >= CUT2)),
    ):
        p = str(work / name)
        df.write.parquet(p)
        paths[name] = p
    out = str(work / "out")
    res0 = rollup_job.main(["--input", paths["base"], "--output", out])
    r1 = refresh_job.main(
        [
            "--output",
            out,
            "--delta-input",
            paths["delta1"],
            "--input",
            paths["base"],
        ]
    )
    r2 = refresh_job.main(["--output", out, "--delta-input", paths["delta2"]])
    # truth: a full-corpus run under the SAME persisted params/boundaries
    # (--resume loads them when the files exist)
    truth = str(work / "truth")
    os.makedirs(truth)
    for f in ("split_params.json", "norm_params.json"):
        shutil.copy(os.path.join(out, f), os.path.join(truth, f))
    rollup_job.main(["--input", paths["full"], "--output", truth, "--resume"])
    return paths, out, truth, (res0, r1, r2)


def _tier_pdf(spark, root, name):
    return (
        spark.read.parquet(os.path.join(root, f"tier_{name}"))
        .select(TIER_COLS)
        .toPandas()
        .sort_values(["source", "bucket_start"])
        .reset_index(drop=True)
    )


def test_refreshed_tiers_equal_full_run(spark, setup):
    _, out, truth, _ = setup
    for tier in DEFAULT_TIERS:
        got = _tier_pdf(spark, out, tier.name)
        exp = _tier_pdf(spark, truth, tier.name)
        assert len(got) == len(exp), f"{tier.name}: {len(got)} vs {len(exp)} rows"
        assert (got["source"].values == exp["source"].values).all()
        assert (got["bucket_start"].values == exp["bucket_start"].values).all()
        assert (got["n_points"].values == exp["n_points"].values).all()
        for c in ("sum_v", "sum_sq", "min_v", "max_v"):
            a = got[c].to_numpy(float)
            b = exp[c].to_numpy(float)
            assert (np.isnan(a) == np.isnan(b)).all(), f"{tier.name}.{c} null drift"
            m = ~np.isnan(a)
            assert np.abs(a[m] - b[m]).max() < 1e-9, f"{tier.name}.{c} diverged"


def test_prepared_series_carries_ma_seam_exactly(spark, setup):
    """The appended prepared rows must equal the full run's prepared rows —
    i.e. the carry tail reproduced each source's trailing window across
    both refresh seams."""
    _, out, truth, _ = setup

    def prepared(root):
        pdf = (
            spark.read.parquet(os.path.join(root, "prepared"))
            .toPandas()
            .sort_values(["source", "tss", "n_tok_z"])
            .reset_index(drop=True)
        )
        return pdf

    got, exp = prepared(out), prepared(truth)
    assert len(got) == len(exp)
    assert (got["source"].values == exp["source"].values).all()
    assert (got["tss"].values == exp["tss"].values).all()
    assert np.abs(got["n_tok_z"].values - exp["n_tok_z"].values).max() < 1e-9


def test_refresh_metrics_and_lineage(spark, setup):
    _, out, _, (_, r1, r2) = setup
    assert r1["tail_bootstrap"] is True
    assert r2["tail_bootstrap"] is False
    assert r1["delta_rows"] > 0 and r2["delta_rows"] > 0
    stages = set()
    with open(os.path.join(out, "manifest.jsonl")) as f:
        for line in f:
            stages.add(json.loads(line)["stage"])
    for t in DEFAULT_TIERS:
        assert f"refresh_{t.name}" in stages


def test_double_apply_is_refused(spark, setup):
    """Re-running the job with an already-absorbed delta must be refused
    (prepared append + tier merge are non-idempotent)."""
    paths, out, _, _ = setup
    with pytest.raises(ValueError, match="already absorbed"):
        refresh_job.main(["--output", out, "--delta-input", paths["delta2"]])


def test_interior_late_data_is_refused(spark, setup, tmp_path):
    paths, out, _, _ = setup
    late = str(tmp_path / "late")
    # rows from BEFORE the current series edge
    spark.read.parquet(paths["delta1"]).limit(50).write.parquet(late)
    with pytest.raises(ValueError, match="order-dependent"):
        refresh_job.main(["--output", out, "--delta-input", late])


def test_refresh_requires_prior_run_state(spark, setup, tmp_path):
    paths, _, _, _ = setup
    with pytest.raises(FileNotFoundError, match="rollup_job"):
        refresh_job.main(
            ["--output", str(tmp_path / "nope"), "--delta-input", paths["delta1"]]
        )


def test_fresh_rebuild_rotates_stale_tail(spark, setup, tmp_path):
    """A fresh (non-resume) rollup_job into an output dir that previous
    refreshes left a carry tail in must rotate that tail with the manifest
    — left in place, the next refresh would continue the MA seam from
    pre-rebuild carry rows (silent numeric corruption)."""
    paths, out, _, _ = setup
    rebuilt = str(tmp_path / "rebuilt")
    shutil.copytree(out, rebuilt)
    tail = os.path.join(rebuilt, "unbias_tail.parquet")
    assert os.path.isdir(tail)  # the setup refreshes persisted one
    rollup_job.main(["--input", paths["full"], "--output", rebuilt])
    assert not os.path.exists(tail)
    assert os.path.isdir(tail + ".prev")


def test_tail_off_series_edge_is_refused(spark, setup, tmp_path):
    """A carry tail whose per-source max(ts) is not the stored series edge
    (stale rebuild leftovers, or a bootstrap from a corpus predating
    absorbed deltas) must be refused — it would seed the MA seam with
    wrong predecessors."""
    paths, out, _, _ = setup
    broken = str(tmp_path / "broken")
    shutil.copytree(out, broken)
    # doctor the tail back to the BASE corpus's edge (as if a crashed swap
    # destroyed it and an operator re-bootstrapped from the original input)
    stale = refresh_job.source_tails(
        spark.read.parquet(paths["base"]).select("source", "ts", "doc_id", "n_tok"),
        ["source"],
        "ts",
        ["doc_id"],
        k=4,
    )
    tail = os.path.join(broken, "unbias_tail.parquet")
    shutil.rmtree(tail)
    stale.coalesce(1).write.parquet(tail)
    delta3 = str(tmp_path / "delta3")
    spark.read.parquet(paths["delta2"]).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 DAY")
    ).write.parquet(delta3)
    with pytest.raises(ValueError, match="series edge"):
        refresh_job.main(["--output", broken, "--delta-input", delta3])
