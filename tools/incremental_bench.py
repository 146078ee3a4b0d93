"""Incremental-refresh scale evidence: refresh cost vs full-rebuild cost
as the corpus grows.

The claim that justifies rollup/incremental.py at 10^12-sequence scale is
proportionality: a full tier rebuild is O(corpus) while an incremental
refresh is O(delta) + fixed cost — so the ratio grows linearly with
corpus size. This harness measures both walls at geometrically growing
corpus sizes with a FIXED-fraction (1%) appended delta, pairing the two
measurements back-to-back per repetition and alternating their order
across reps, so the shared host's minute-scale throughput drift hits both
sides equally instead of confounding the ratio.

Both sides do the same kind of work to the same layout: the rebuild
aggregates the full corpus and writes all three tiers Hive-partitioned by
(source, bucket_day); the refresh merges the delta's partials into a
pre-built base tree, rewriting only touched (source, day) partitions.

Writes BENCH/incremental_scale.json and prints one JSON line.

Usage: python tools/incremental_bench.py [--sizes 2000000,8000000,32000000]
       [--reps 3] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="2000000,8000000,32000000")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    p.add_argument("--delta-fraction", type=float, default=0.01)
    args = p.parse_args()

    from preprocessor_spark import get_spark
    from preprocessor_spark.rollup.incremental import (
        IncrementalRollup,
        with_bucket_day,
    )
    from preprocessor_spark.rollup.tiers import RollupTree
    from preprocessor_spark.synth import token_sequences

    spark = get_spark(
        "incremental_bench", master=f"local[{args.cpus}]", batch_committer_v2=True
    )
    spark.sparkContext.setLogLevel("ERROR")
    tree = RollupTree(value_col="n_tok")
    results = []

    for n_rows in [int(s) for s in args.sizes.split(",")]:
        # narrow projection before caching: the rollup reads only
        # (ts, source, n_tok); caching token arrays would turn the harness
        # into a memory bench
        corpus = token_sequences(spark, n_rows).select(
            "ts", "source", "n_tok"
        ).cache()
        n = corpus.count()
        t0s, t1s = corpus.agg(
            F.unix_timestamp(F.min("ts")), F.unix_timestamp(F.max("ts"))
        ).collect()[0]
        cut = F.timestamp_seconds(
            F.lit(int(t1s - (t1s - t0s) * args.delta_fraction))
        )
        base = corpus.filter(F.col("ts") < cut)
        delta = corpus.filter(F.col("ts") >= cut).cache()
        dn = delta.count()

        work = tempfile.mkdtemp(prefix="inc_bench_")
        base_root = os.path.join(work, "base_tree")

        def build(facts, root):
            t0 = time.perf_counter()
            for tier in tree.tiers:
                with_bucket_day(tree.base_aggregate(facts, tier)).write.mode(
                    "overwrite"
                ).partitionBy("source", "bucket_day").parquet(
                    os.path.join(root, f"tier_{tier.name}")
                )
            return time.perf_counter() - t0

        def refresh():
            root = os.path.join(work, "refresh_tree")
            shutil.rmtree(root, ignore_errors=True)
            shutil.copytree(base_root, root)
            inc = IncrementalRollup(
                tree, root, partition_cols=["source", "bucket_day"]
            )
            t0 = time.perf_counter()
            m = inc.refresh(spark, delta)
            dt = time.perf_counter() - t0
            parts = {t.name: m[t.name]["partitions_rewritten"] for t in tree.tiers}
            shutil.rmtree(root, ignore_errors=True)
            return dt, parts

        build(base, base_root)  # the pre-existing tree the refresh mutates
        # untimed warm pass of both plans (steady-state convention: JIT and
        # scan setup amortize to zero in a long-lived job)
        refresh()
        build(corpus, os.path.join(work, "warm_tree"))

        reps = []
        parts = {}
        for rep in range(args.reps):
            # alternate order so linear host drift cancels in the ratio
            if rep % 2 == 0:
                rebuild_s = build(corpus, os.path.join(work, "rebuild_tree"))
                refresh_s, parts = refresh()
            else:
                refresh_s, parts = refresh()
                rebuild_s = build(corpus, os.path.join(work, "rebuild_tree"))
            reps.append(
                {
                    "rebuild_s": round(rebuild_s, 3),
                    "refresh_s": round(refresh_s, 3),
                    "ratio": round(rebuild_s / refresh_s, 3),
                }
            )
        ratios = sorted(r["ratio"] for r in reps)
        med = ratios[len(ratios) // 2]
        row = {
            "corpus_rows": n,
            "delta_rows": dn,
            "reps": reps,
            "median_ratio": med,
            "partitions_rewritten": parts,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        shutil.rmtree(work, ignore_errors=True)
        corpus.unpersist()
        delta.unpersist()

    out = {
        "bench": "incremental_refresh_scale",
        "cpus": int(args.cpus),
        "delta_fraction": args.delta_fraction,
        "results": results,
    }
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "incremental_scale.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
