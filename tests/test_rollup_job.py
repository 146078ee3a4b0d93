"""End-to-end tests for the spark-submit rollup job (plans/rollup_job.py):
tier outputs match the library gap-fill chain, lineage is emitted per
partition, and a resumed run skips completed partitions while producing an
identical tree (SURVEY §5 strategy d)."""

import json
import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from preprocessor_spark.plans import rollup_job
from preprocessor_spark.rollup.tiers import (
    DEFAULT_TIERS,
    RollupTree,
    duration_seconds,
    spine_from_bounds,
)
from preprocessor_spark.synth import token_sequences, write_corpus

TIER_COLS = ["source", "bucket_start", "n_points", "sum_v", "sum_sq", "min_v", "max_v"]


@pytest.fixture(scope="module")
def job_out(spark, tmp_path_factory):
    work = tmp_path_factory.mktemp("rollup_job")
    corpus = str(work / "corpus")
    out = str(work / "out")
    write_corpus(spark, corpus, 30_000)
    res = rollup_job.main(["--input", corpus, "--output", out])
    return corpus, out, res


def _close(spark, a, b, tol=1e-9):
    j = a.alias("r").join(b.alias("g"), on=["source", "bucket_start"], how="full")
    return (
        j.filter(
            (F.col("r.n_points") != F.col("g.n_points"))
            | (F.abs(F.col("r.sum_v") - F.col("g.sum_v")) > tol)
            | (F.abs(F.col("r.sum_sq") - F.col("g.sum_sq")) > tol)
            | F.col("r.n_points").isNull()
            | F.col("g.n_points").isNull()
        ).count()
        == 0
    )


def test_job_tiers_match_library_chain(spark, job_out):
    """The job's epoch-integer tier path must equal the library's
    timestamp/F.window chain — prepared stores epoch seconds (tss), so
    decode it back to a timestamp and rebuild the reference tree."""
    _, out, res = job_out
    prepared = spark.read.parquet(os.path.join(out, "prepared")).withColumn(
        "ts", F.timestamp_seconds("tss")
    )
    coarse_key = "+".join(t.name for t in DEFAULT_TIERS[1:])
    tree = RollupTree(time_col="ts", series_cols=["source"], value_col="n_tok_z")
    cur = tree.base_aggregate(prepared, DEFAULT_TIERS[0])
    for i, tier in enumerate(DEFAULT_TIERS):
        if i > 0:
            cur = tree.reaggregate(cur, tier)
        ref = tree.gap_fill(cur, tier).select(TIER_COLS)
        got = spark.read.parquet(os.path.join(out, f"tier_{tier.name}")).select(
            TIER_COLS
        )
        assert _close(spark, ref, got), f"tier {tier.name} diverged"
        reported = (
            res["tiers"][tier.name]["out_buckets"]
            if i == 0
            else res["tiers"][coarse_key]["out_buckets_by_tier"][tier.name]
        )
        assert reported == got.count()


def test_job_lineage_per_partition(spark, job_out):
    _, out, res = job_out
    lineage = [
        json.loads(line)
        for line in open(os.path.join(out, "manifest.jsonl"))
    ]
    sources = {r["source"] for r in spark.read.parquet(
        os.path.join(out, "prepared")).select("source").distinct().collect()}
    for tier in DEFAULT_TIERS:
        done = {r["partition"] for r in lineage if r["stage"] == f"tier_{tier.name}"}
        assert done == sources
        assert all(
            "rows" in r and "seconds" in r
            for r in lineage
            if r["stage"] == f"tier_{tier.name}"
        )


def test_job_resume_skips_completed_and_is_identical(spark, job_out, tmp_path):
    corpus, out, _ = job_out
    # simulate a crash after tier_5m: drop manifest rows for 1h/1d and the
    # written 1h/1d outputs, then resume
    out2 = str(tmp_path / "out_resumed")
    shutil.copytree(out, out2)
    man = os.path.join(out2, "manifest.jsonl")
    rows = [json.loads(line) for line in open(man)]
    with open(man, "w") as f:
        for r in rows:
            if r["stage"] == "tier_5m":
                f.write(json.dumps(r) + "\n")
    shutil.rmtree(os.path.join(out2, "tier_1h"))
    shutil.rmtree(os.path.join(out2, "tier_1d"))

    res2 = rollup_job.main(
        ["--input", corpus, "--output", out2, "--resume"]
    )
    for tier in DEFAULT_TIERS:
        a = spark.read.parquet(os.path.join(out, f"tier_{tier.name}")).select(
            TIER_COLS
        )
        b = spark.read.parquet(os.path.join(out2, f"tier_{tier.name}")).select(
            TIER_COLS
        )
        assert _close(spark, a, b, tol=1e-12), f"resume diverged at {tier.name}"
    # the resumed run did not rewrite tier_5m: manifest still has exactly
    # one completion row per source for it
    lineage = [json.loads(line) for line in open(man)]
    per_src = {}
    for r in lineage:
        if r["stage"] == "tier_5m":
            per_src[r["partition"]] = per_src.get(r["partition"], 0) + 1
    assert all(v == 1 for v in per_src.values())


def test_spine_from_bounds_equals_dense_spine(spark):
    corpus = token_sequences(spark, 5_000)
    tree = RollupTree(time_col="ts", series_cols=["source"], value_col="n_tok")
    for tier in DEFAULT_TIERS:
        cur = tree.base_aggregate(corpus, tier)
        ref = tree.gap_fill(cur, tier).select("source", "bucket_start")
        bounds = [
            tuple(r)
            for r in cur.groupBy("source")
            .agg(
                F.min(F.unix_timestamp("bucket_start")).alias("t0"),
                F.max(F.unix_timestamp("bucket_start")).alias("t1"),
            )
            .collect()
        ]
        spine = spine_from_bounds(
            spark, bounds, ["source"], duration_seconds(tier.duration),
            max_chunk=7,  # force the two-level chunked explode path
        )
        assert (
            spine.exceptAll(ref).count() == 0
            and ref.exceptAll(spine).count() == 0
        ), f"spine mismatch at {tier.name}"


def test_spine_from_bounds_non_string_series(spark):
    """Series columns keep their real types when a schema source is given —
    an integer series key must join (not silently mismatch) against the
    tier's own rows."""
    tier = spark.createDataFrame(
        pd.DataFrame(
            {
                "sensor": [1, 1, 2],
                "bucket_start": pd.to_datetime(
                    ["2020-01-01 00:00", "2020-01-01 00:10", "2020-01-01 00:00"]
                ),
                "n_points": [3, 4, 5],
            }
        )
    )
    bounds = [
        tuple(r)
        for r in tier.groupBy("sensor")
        .agg(
            F.min(F.unix_timestamp("bucket_start")).alias("t0"),
            F.max(F.unix_timestamp("bucket_start")).alias("t1"),
        )
        .collect()
    ]
    spine = spine_from_bounds(
        spark, bounds, ["sensor"], 300, series_schema=tier
    )
    assert dict(spine.dtypes)["sensor"] == dict(tier.dtypes)["sensor"]
    joined = spine.join(tier, ["sensor", "bucket_start"], "left")
    # sensor 1 spans 3 buckets (2 present, 1 gap), sensor 2 spans 1
    assert joined.count() == 4
    assert joined.filter("n_points is not null").count() == 3


def test_job_epoch_survives_2038(spark, tmp_path):
    """The prepared series stores event time as epoch-seconds LONG — int32
    would wrap negative at/after 2038-01-19 in non-ANSI mode, silently
    corrupting bucket keys (and the epoch floor assumes non-negative
    epochs). Run the job on a post-2038 corpus and check the tier buckets
    land in the right decade."""
    from preprocessor_spark.synth import token_sequences

    corpus = str(tmp_path / "corpus_2040")
    shifted = token_sequences(spark, 3_000).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 20 YEARS")
    )
    shifted.write.mode("overwrite").partitionBy("source").parquet(corpus)
    out = str(tmp_path / "out_2040")
    rollup_job.main(["--input", corpus, "--output", out])
    prepared = spark.read.parquet(os.path.join(out, "prepared"))
    assert dict(prepared.dtypes)["tss"] == "bigint"
    assert prepared.filter("tss < 0").count() == 0
    t5 = spark.read.parquet(os.path.join(out, "tier_5m"))
    years = [
        r[0]
        for r in t5.select(F.year("bucket_start")).distinct().collect()
    ]
    assert all(y >= 2038 for y in years), years


def test_job_rejects_non_nesting_tier(spark, tmp_path, monkeypatch):
    """A coarse tier whose period does not nest in the previous tier's must
    raise (ValueError, not a strippable assert) — the one-job coarse chain
    would otherwise silently misalign buckets."""
    import preprocessor_spark.rollup.tiers as tiers_mod
    from preprocessor_spark.rollup.tiers import TierSpec

    bad = [TierSpec("5m", "5 minutes"), TierSpec("7m", "7 minutes")]
    # rollup_job.main imports DEFAULT_TIERS from the tiers module at call
    # time, so patching the module attribute reaches it
    monkeypatch.setattr(tiers_mod, "DEFAULT_TIERS", bad)
    corpus = str(tmp_path / "corpus_bad")
    write_corpus(spark, corpus, 2_000)
    with pytest.raises(ValueError, match="must nest"):
        rollup_job.main(
            ["--input", corpus, "--output", str(tmp_path / "out_bad")]
        )


def test_bulk_resume_lineage_counts_survive_stringy_partition_values(
    spark, tmp_path
):
    """Partition values whose directory names round-trip through type
    inference differently ('3'→int 3, '03'→int 3 too — a collision!) must
    still get true lineage counts: the counts ride the write itself as
    value-keyed observed aggregates, never a read-back lookup."""
    import os

    from preprocessor_spark.rollup.checkpoint import Manifest, run_resumable_bulk

    df = spark.createDataFrame(
        [("3", i) for i in range(7)]
        + [("03", i) for i in range(2)]
        + [("4", i) for i in range(5)],
        "source string, v long",
    )
    out = str(tmp_path / "out")
    manifest = Manifest(os.path.join(str(tmp_path), "manifest.jsonl"))
    run_resumable_bulk(spark, df, "stage", "source", out, manifest)
    rows = {}
    import json

    with open(os.path.join(str(tmp_path), "manifest.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            rows[rec["partition"]] = rec.get("rows")
    assert rows == {"3": 7, "03": 2, "4": 5}
