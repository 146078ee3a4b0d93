"""Tier block encode→decode round-trip through Spark (applyInPandas /
mapInPandas) and checkpoint/resume idempotence (SURVEY §5 strategy c, d)."""

import os

import numpy as np
import pytest

from preprocessor_spark.rollup.compression import (
    decode_tier_blocks,
    encode_tier_blocks,
)
from preprocessor_spark.rollup.tiers import RollupTree, TierSpec
from preprocessor_spark.synth import token_sequences


@pytest.fixture(scope="module")
def tier_1h(spark):
    # rows_per_minute=2 → ~67h of data → enough 1h buckets per source that
    # codec headers amortize (compression needs realistic series length)
    corpus = token_sequences(spark, 8000, rows_per_minute=2)
    tree = RollupTree(value_col="n_tok")
    return tree.base_aggregate(corpus, TierSpec("1h", "1 hour")).cache()


def test_block_roundtrip_identity(spark, tier_1h):
    blocks = encode_tier_blocks(tier_1h, ["source"], block_buckets=32)
    decoded = decode_tier_blocks(blocks, ["source"])
    a = (
        tier_1h.toPandas()
        .sort_values(["source", "bucket_start"])
        .reset_index(drop=True)
    )
    b = (
        decoded.toPandas()
        .sort_values(["source", "bucket_start"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    assert (a["source"].values == b["source"].values).all()
    assert (
        a["bucket_start"].values.astype("datetime64[s]")
        == b["bucket_start"].values.astype("datetime64[s]")
    ).all()
    assert (a["n_points"].values == b["n_points"].values).all()
    for c in ("sum_v", "sum_sq", "min_v", "max_v"):
        # bit-exact float round-trip
        assert np.array_equal(
            a[c].to_numpy(np.float64).view(np.uint64),
            b[c].to_numpy(np.float64).view(np.uint64),
        )


def test_blocks_are_bounded_and_compressed(spark, tier_1h):
    blocks = encode_tier_blocks(tier_1h, ["source"], block_buckets=32).toPandas()
    assert (blocks["n"] <= 32).all()
    raw_bytes = int(tier_1h.count()) * (8 + 8 + 8 * 4)  # ts + count + 4 floats
    enc_bytes = int(
        blocks[[c for c in blocks.columns if c.endswith("_blob")]]
        .map(len)
        .sum()
        .sum()
    )
    assert enc_bytes < raw_bytes  # net compression on realistic tier data


def test_checkpoint_resume_idempotent(spark, tier_1h, tmp_path):
    from preprocessor_spark.rollup.checkpoint import Manifest, run_resumable

    out = str(tmp_path / "tier_out")
    man = Manifest(str(tmp_path / "manifest.jsonl"))
    first = run_resumable(spark, tier_1h, "tier1h", "source", out, man)
    assert sorted(first) == sorted(
        r[0] for r in tier_1h.select("source").distinct().collect()
    )
    # rerun: everything skipped, output unchanged
    before = spark.read.parquet(out).count()
    second = run_resumable(spark, tier_1h, "tier1h", "source", out, man)
    assert second == []
    assert spark.read.parquet(out).count() == before
    # lineage rows carry metrics per partition
    lin = man.lineage()
    assert all(r["rows"] > 0 and "seconds" in r for r in lin)


def test_checkpoint_partial_failure_resume(spark, tier_1h, tmp_path):
    from preprocessor_spark.rollup.checkpoint import Manifest, run_resumable

    out = str(tmp_path / "tier_out")
    man = Manifest(str(tmp_path / "manifest.jsonl"))
    sources = sorted(r[0] for r in tier_1h.select("source").distinct().collect())
    # simulate a prior run that completed only the first two partitions
    for s in sources[:2]:
        run_resumable(
            spark,
            tier_1h.filter(f"source = '{s}'"),
            "tier1h",
            "source",
            out,
            man,
        )
    resumed = run_resumable(spark, tier_1h, "tier1h", "source", out, man)
    assert sorted(resumed) == sources[2:]
    got = spark.read.parquet(out)
    assert got.count() == tier_1h.count()
    assert os.path.isdir(os.path.join(out, f"source={sources[0]}"))


def test_gap_rows_roundtrip_null_stats_and_negative_epochs(spark):
    """Compressed blocks must restore the (n_points=0, NULL stats) gap-row
    invariant — the float codec stores nulls as NaN bit patterns, and a
    NaN poisons F.min/F.max and the incremental seed merge downstream.
    Pre-1970 buckets must also land on the floor-based block grid, not a
    truncate-toward-zero one that straddles epoch."""
    import datetime as dt

    from pyspark.sql import functions as F

    rows = []
    for k in range(-3, 3):  # buckets straddling epoch
        t = dt.datetime(1970, 1, 1) + dt.timedelta(hours=k)
        if k == 0:
            rows.append(("s0", t, 0, None, None, None, None))  # gap row
        else:
            rows.append(("s0", t, 2, 4.0, 10.0, 1.0, 3.0))
    tier = spark.createDataFrame(
        rows,
        "source string, bucket_start timestamp, n_points long, "
        "sum_v double, sum_sq double, min_v double, max_v double",
    )
    blocks = encode_tier_blocks(tier, block_buckets=4, bucket_seconds=3600)
    back = decode_tier_blocks(blocks)
    assert back.count() == 6
    gap = back.filter(F.col("n_points") == 0).collect()
    assert len(gap) == 1
    for c in ("sum_v", "sum_sq", "min_v", "max_v"):
        assert gap[0][c] is None  # NULL, not NaN
    # real rows keep exact values
    real = back.filter(F.col("n_points") > 0)
    assert real.filter(F.col("sum_v") != 4.0).count() == 0
    # aggregates are not NaN-poisoned after the roundtrip
    agg = back.agg(F.max("max_v"), F.min("min_v")).collect()[0]
    assert agg[0] == 3.0 and agg[1] == 1.0
