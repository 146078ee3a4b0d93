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
