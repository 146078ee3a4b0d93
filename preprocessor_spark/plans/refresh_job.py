"""Incremental refresh job — absorb an appended delta corpus into an
existing rollup_job output, touching O(|delta|) data.

    spark-submit --py-files engine.zip preprocessor_spark/plans/refresh_job.py \
        --output /path/out --delta-input /path/new_sequences [--input /path/corpus]

Continues every stage of plans/rollup_job.py on the delta ONLY, under the
original run's persisted decisions (the production contract: params are
fitted once and versioned — a param re-fit is a rebuild event, not a
refresh):

  1. split labels from the persisted time boundaries (pure predicates);
  2. z-score from the persisted params (no re-fit);
  3. MA-unbias CONTINUATION: the first delta rows' trailing windows span
     the seam, so the job prepends each source's last w−1 historical rows
     (the "carry tail"), runs the identical window, and drops the carried
     rows — residuals equal a full-corpus recompute exactly. The tail is
     persisted per refresh (sources × (w−1) rows — tiny); the FIRST
     refresh bootstraps it from the original corpus (--input) with a
     max-ts + widening-margin scan, the only O(corpus) touch, paid once.
  4. delta prepared rows appended to the prepared store;
  5. every tier refreshed in place via rollup/incremental.py — algebraic
     merge + dynamic partition overwrite of touched partitions only, with
     dense-tier extension seeds from the persisted series bounds;
  6. Gorilla/delta-of-delta blocks re-encoded for touched sources;
  7. lineage rows appended to the same manifest.

Append-only seam contract: the MA continuation is only exact when every
delta row lands at-or-after its source's previous max event time (order-
dependent operators cannot absorb interior late data incrementally — a
late row changes the residuals of rows AFTER it, which are already
written). The job validates this per source and refuses otherwise; the
tier refresh itself (order-free algebra) has no such constraint and is
exercised with late data in tests/test_incremental.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TAIL_NAME = "unbias_tail.parquet"


def source_tails(
    corpus: DataFrame,
    series_cols: list[str],
    time_col: str,
    tiebreak_cols: list[str],
    k: int,
    margin_s: int = 3600,
) -> DataFrame:
    """Last ``k`` rows per series by (time, tiebreaks) without a global
    sort: one partial-agg pass learns each series' max time and row count,
    then a widening time-margin predicate bounds the candidate set (a
    pushed-down parquet filter) before the small top-k window. Widens ×16
    until every series has min(k, its total) candidates."""
    stats = corpus.groupBy(*series_cols).agg(
        F.max(time_col).alias("__mx"), F.count(F.lit(1)).alias("__tot")
    )
    b = F.broadcast(stats)
    while True:
        # epoch-long arithmetic, not INTERVAL: the widening loop can push
        # the margin past interval bounds, and the predicate compares two
        # columns anyway (no pushdown to lose)
        cand = corpus.join(b, series_cols).filter(
            F.unix_timestamp(F.col(time_col))
            >= F.unix_timestamp(F.col("__mx")) - F.lit(int(margin_s))
        )
        counts = {
            tuple(r[:-2]): (r[-2], r[-1])
            for r in cand.groupBy(*series_cols)
            .agg(F.count(F.lit(1)).alias("__n"), F.first("__tot").alias("__tot"))
            .collect()
        }
        if all(n >= min(k, tot) for n, tot in counts.values()):
            break
        margin_s *= 16
    w = Window.partitionBy(*series_cols).orderBy(
        *[F.col(c).desc() for c in (time_col, *tiebreak_cols)]
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__mx", "__tot")
    )


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--output", required=True, help="an existing rollup_job output dir")
    p.add_argument("--delta-input", required=True, help="appended sequences parquet")
    p.add_argument(
        "--input",
        default=None,
        help="original corpus (required only for the FIRST refresh, to "
        "bootstrap the unbias carry tail)",
    )
    p.add_argument("--master", default=None)
    p.add_argument("--no-blocks", action="store_true")
    args = p.parse_args(argv)

    from preprocessor_spark import get_spark
    from preprocessor_spark.operators import Normalizer, TemporalSplitter, Unbiaser
    from preprocessor_spark.params import load_params
    from preprocessor_spark.rollup.checkpoint import Manifest
    from preprocessor_spark.rollup.compression import encode_tier_blocks
    from preprocessor_spark.rollup.incremental import (
        IncrementalRollup,
        load_bounds,
    )
    from preprocessor_spark.rollup.tiers import DEFAULT_TIERS, RollupTree

    spark = get_spark("refresh_job", master=args.master, batch_committer_v2=True)
    spark.sparkContext.setLogLevel("ERROR")
    out = args.output
    t_start = time.perf_counter()

    split_params_path = os.path.join(out, "split_params.json")
    norm_params_path = os.path.join(out, "norm_params.json")
    bounds_path = os.path.join(out, "series_bounds.json")
    for path, what in (
        (split_params_path, "split boundaries"),
        (norm_params_path, "normalization params"),
        (bounds_path, "series bounds"),
    ):
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"refresh requires the original run's {what} at {path} — "
                "run plans/rollup_job.py first"
            )
    manifest = Manifest(os.path.join(out, "manifest.jsonl"))
    boundaries = load_params(split_params_path).params["boundaries"]
    nparams = load_params(norm_params_path)
    old_bounds = load_bounds(bounds_path)

    delta = spark.read.parquet(args.delta_input)
    delta_rows = delta.count()
    if delta_rows == 0:
        result = {"job": "refresh_job", "delta_rows": 0, "total_seconds": 0.0}
        print(json.dumps(result))
        return result

    # Double-apply guard: the prepared append and the tier merge are both
    # non-idempotent, so applying the same delta twice would double-count
    # every touched bucket. The delta is fingerprinted by content-extent
    # (rows + per-source time bounds); a `started` mark lands in the
    # manifest before the first write and a `refresh_delta` completion mark
    # after the last — so a rerun is refused BOTH after full success and
    # after a mid-job crash (started-without-completed means partially
    # applied, and unlike the tier jobs there is no per-partition unit to
    # resume idempotently; recovery is restoring the output dir, or
    # rebuilding via rollup_job). At deployment the whole refresh is one
    # Iceberg transaction and this guard becomes the commit's snapshot
    # check. The streaming path (stream_refresh_tiers) carries the same
    # guard keyed on micro-batch epoch ids.
    extent = (
        delta.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.unix_timestamp(F.min("ts")).cast("long").alias("t0"),
            F.unix_timestamp(F.max("ts")).cast("long").alias("t1"),
        )
        .orderBy("source")
        .collect()
    )
    import hashlib

    fingerprint = hashlib.sha256(
        json.dumps([[r[0], int(r[1]), int(r[2]), int(r[3])] for r in extent]).encode()
    ).hexdigest()[:16]
    if fingerprint in manifest.completed("refresh_delta"):
        raise ValueError(
            f"delta {args.delta_input} (fingerprint {fingerprint}) was "
            "already absorbed by a previous refresh — re-applying would "
            "double-count every touched bucket"
        )
    if fingerprint in manifest.completed("refresh_delta_started"):
        raise ValueError(
            f"a previous refresh of delta {args.delta_input} (fingerprint "
            f"{fingerprint}) started but did not complete — the output may "
            "be partially refreshed and a blind rerun would double-apply "
            "the absorbed portion; restore the output dir from before that "
            "run (or rebuild with rollup_job) before retrying"
        )

    # -- append-only seam validation (see module docstring) ---------------
    # the fingerprint extent already carries per-source min ts — reuse it
    delta_mins = {(r[0],): int(r[2]) for r in extent}
    old_max = {tuple(r[:-2]): int(r[-1]) for r in old_bounds}
    stale = {
        k: (m, old_max[k])
        for k, m in delta_mins.items()
        if k in old_max and m < old_max[k]
    }
    if stale:
        raise ValueError(
            "delta contains rows BEFORE the existing series edge for "
            f"{sorted(stale)} (delta min vs stored max epoch: {stale}); the "
            "MA-unbias continuation is order-dependent and cannot absorb "
            "interior late data — re-run rollup_job over the affected range "
            "instead (the tier merge itself would be fine; the prepared "
            "series would not)"
        )

    # -- split + normalize under persisted decisions -----------------------
    labeled = TemporalSplitter.split_by_time_boundaries(delta, "ts", boundaries)
    with_z = labeled.withColumn("n_tok_z", F.col("n_tok").cast("double"))
    norm = Normalizer(method="zscore", columns=["n_tok_z"])
    normed = norm.transform(with_z, nparams)

    # -- MA-unbias continuation across the seam ----------------------------
    w_size = 5
    tail_path = os.path.join(out, TAIL_NAME)
    t0 = time.perf_counter()
    if os.path.exists(tail_path):
        tail_raw = spark.read.parquet(tail_path)
        tail_bootstrap = False
    else:
        if not args.input:
            raise FileNotFoundError(
                "first refresh: pass --input (original corpus) to bootstrap "
                f"the unbias carry tail (persisted afterwards at {tail_path})"
            )
        tail_raw = source_tails(
            spark.read.parquet(args.input).select("source", "ts", "doc_id", "n_tok"),
            ["source"],
            "ts",
            ["doc_id"],
            k=w_size - 1,
        )
        tail_bootstrap = True
    # Tail-at-edge validation: the carry rows MUST be the last rows of the
    # absorbed series, i.e. per-source max(ts) == the stored bounds edge.
    # Catches a tail left stale by a fresh rollup_job rebuild into the same
    # output dir, and a bootstrap from an --input that predates already
    # absorbed deltas (e.g. after a crashed swap destroyed the tail) —
    # either would silently seed the MA seam with wrong predecessors.
    tail_edge = {
        r[0]: int(r[1])
        for r in tail_raw.groupBy("source")
        .agg(F.unix_timestamp(F.max("ts")).cast("long").alias("t1"))
        .collect()
    }
    bounds_edge = {r[0]: int(r[-1]) for r in old_bounds}
    edge_mismatch = {
        s: (tail_edge.get(s), e)
        for s, e in bounds_edge.items()
        if tail_edge.get(s) != e
    }
    if edge_mismatch:
        raise ValueError(
            "unbias carry tail does not sit at the stored series edge for "
            f"{sorted(edge_mismatch)} (tail max vs series_bounds.json max "
            f"epoch: {dict(sorted(edge_mismatch.items()))}); the tail is "
            "stale (fresh rebuild into this output dir?) or bootstrapped "
            "from a corpus that predates absorbed deltas — rebuild with "
            "rollup_job, or restore the matching unbias tail, before "
            "refreshing"
        )
    # tails are raw rows: renormalizing them with the SAME params yields
    # exactly the values the original prepared store holds for them
    tail_z = norm.transform(
        tail_raw.withColumn("n_tok_z", F.col("n_tok").cast("double")), nparams
    ).select("source", "ts", "doc_id", "n_tok_z", F.lit(True).alias("__carry"))
    delta_z = normed.select(
        "source", "ts", "doc_id", "n_tok_z", F.lit(False).alias("__carry")
    )
    unb = Unbiaser(
        method="ma",
        window_size=w_size,
        series_cols=["source"],
        value_cols=["n_tok_z"],
        tiebreak_cols=["doc_id"],
    )
    prepared_delta = (
        unb.transform(tail_z.unionByName(delta_z))
        .filter(~F.col("__carry"))
        .select(
            F.unix_timestamp("ts").cast("long").alias("tss"),
            "source",
            "n_tok_z",
        )
        .cache()  # consumed twice: the prepared append AND the tier refresh
    )
    prepared_path = os.path.join(out, "prepared")
    # first mutation of the output dir — the crash-detection mark goes in
    # immediately before it (see the double-apply guard above)
    manifest.mark("refresh_delta_started", fingerprint, rows=delta_rows)
    prepared_delta.sortWithinPartitions("source", "tss").write.mode(
        "append"
    ).parquet(prepared_path)
    prepare_seconds = round(time.perf_counter() - t0, 3)

    # next refresh's carry tail: last w−1 raw rows per source across
    # (old tail ∪ delta) — tiny, computed driver-cheap with the same top-k
    new_tail = source_tails(
        tail_raw.select("source", "ts", "doc_id", "n_tok").unionByName(
            delta.select("source", "ts", "doc_id", "n_tok")
        ),
        ["source"],
        "ts",
        ["doc_id"],
        k=w_size - 1,
        margin_s=1 << 62,  # tail ∪ delta is small; skip the margin dance
    )
    # NOTE: only MATERIALIZE the new tail here (the .tmp write) — the swap
    # of tail_path itself must wait until after the tier refresh below:
    # prepared_delta's lineage reads tail_path, and a cache-block loss
    # during the tier refresh would recompute the unbias plan from
    # whatever tail_path then holds. Swapping early would silently seed
    # that recompute with the NEW tail (wrong MA predecessors).
    tmp_tail = tail_path + ".tmp"
    bak_tail = tail_path + ".bak"
    new_tail.coalesce(1).write.mode("overwrite").parquet(tmp_tail)

    # -- tier refresh (dense: the job's tiers are gap-filled) --------------
    # the refreshed series is the prepared one; its event time re-enters
    # timestamp space for the tier key (|delta| rows, not |corpus|)
    t0 = time.perf_counter()
    tree = RollupTree(
        time_col="ts",
        series_cols=["source"],
        value_col="n_tok_z",
        tiers=DEFAULT_TIERS,
    )
    delta_facts = prepared_delta.select(
        F.timestamp_seconds("tss").alias("ts"), "source", "n_tok_z"
    )
    inc = IncrementalRollup(tree, out, dense=True)
    tier_metrics = inc.refresh(spark, delta_facts, manifest=manifest)
    refresh_seconds = round(time.perf_counter() - t0, 3)

    # -- re-encode compression blocks for touched sources ------------------
    compress_seconds = None
    if not args.no_blocks:
        t0 = time.perf_counter()
        touched_sources = sorted(
            {k[0] if isinstance(k, tuple) else k for k in delta_mins}
        )
        tier0_name = DEFAULT_TIERS[0].name
        tier0 = spark.read.parquet(os.path.join(out, f"tier_{tier0_name}"))
        blocks = encode_tier_blocks(
            tier0.filter(
                (F.col("n_points") > 0)
                & F.col("source").isin(touched_sources)
            ),
            ["source"],
            block_buckets=4096,
            bucket_seconds=300,
        )
        before = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            blocks.write.mode("overwrite").partitionBy("source").parquet(
                os.path.join(out, "blocks_" + tier0_name)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", before)
        compress_seconds = round(time.perf_counter() - t0, 3)

    prepared_delta.unpersist()
    # swap the carry tail into place now that nothing can re-read the old
    # one: two atomic renames, never an unlink of the only copy — a crash
    # in the window between them leaves the old tail intact at .bak (the
    # previous rmtree-then-replace destroyed it before the new one landed)
    import shutil

    shutil.rmtree(bak_tail, ignore_errors=True)
    if os.path.exists(tail_path):
        os.replace(tail_path, bak_tail)
    os.replace(tmp_tail, tail_path)
    shutil.rmtree(bak_tail, ignore_errors=True)
    manifest.mark("refresh_delta", fingerprint, rows=delta_rows)
    total = round(time.perf_counter() - t_start, 3)
    result = {
        "job": "refresh_job",
        "delta_rows": delta_rows,
        "tail_bootstrap": tail_bootstrap,
        "prepare_seconds": prepare_seconds,
        "refresh_seconds": refresh_seconds,
        "compress_seconds": compress_seconds,
        "tiers": tier_metrics,
        "total_seconds": total,
        "delta_rows_per_sec": round(delta_rows / max(total, 1e-9)),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
