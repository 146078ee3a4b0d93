"""Two-cluster scaling evidence (BASELINE.md protocol).

The north rule requires ≥0.8 throughput scaling efficiency from N to 4N
executors. This sandbox has no multi-node cluster, so (per BASELINE.md) we
run the IDENTICAL spark-submit job at two parallelism levels on the same
input — local[N] vs local[4N] — in fresh JVMs, and report per-tier
throughput + efficiency eff = (throughput_4N / throughput_N) / 4.

Usage: python tools/scaling_bench.py [--rows 4000000] [--n 8]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_pyfiles(path: str) -> str:
    """Package the engine for spark-submit --py-files."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(os.path.join(REPO, "preprocessor_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


def run_job(pyfiles: str, input_path: str, out: str, cpus: int) -> dict:
    """Launch the job in a fresh JVM via spark-submit at local[cpus]."""
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(os.path.dirname(shutil.which("python"))),
        "lib",
        "python3.11",
        "site-packages",
        "pyspark",
        "bin",
        "spark-submit",
    )
    cmd = [
        spark_submit,
        "--master",
        f"local[{cpus}]",
        # driver-memory must be on the submit line: the JVM is already
        # running by the time in-code builder confs are seen
        "--driver-memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        "--conf",
        "spark.ui.enabled=false",
        "--py-files",
        pyfiles,
        os.path.join(REPO, "preprocessor_spark", "plans", "rollup_job.py"),
        "--input",
        input_path,
        "--output",
        out,
        "--master",
        f"local[{cpus}]",
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    proc = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=3000
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    sys.stderr.write(proc.stdout[-3000:] + "\n" + proc.stderr[-5000:])
    raise RuntimeError(f"job at local[{cpus}] produced no JSON result")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--n", type=int, default=8, help="N cores (4N run uses 4x)")
    ap.add_argument("--workdir", default="/tmp/ppspark_scaling")
    ap.add_argument(
        "--len-cap",
        type=int,
        default=None,
        help="cap token-sequence length in the generated corpus (the rollup "
        "job reads only n_tok; capping keeps generation/storage costs from "
        "dominating the scaling measurement)",
    )
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    pyfiles = make_pyfiles(os.path.join(args.workdir, "engine.zip"))
    suffix = f"_cap{args.len_cap}" if args.len_cap else ""
    corpus = os.path.join(args.workdir, f"corpus_{args.rows}{suffix}")

    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        sys.path.insert(0, REPO)
        from preprocessor_spark import get_spark
        from preprocessor_spark.synth import write_corpus

        spark = get_spark("gen", master="local[32]")
        write_corpus(spark, corpus, args.rows, len_cap=args.len_cap)
        spark.stop()

    results = {}
    for cpus in (args.n, 4 * args.n):
        out = os.path.join(args.workdir, f"out_{cpus}")
        shutil.rmtree(out, ignore_errors=True)
        results[cpus] = run_job(pyfiles, corpus, out, cpus)
        print(f"local[{cpus}]: {json.dumps(results[cpus])}", file=sys.stderr)

    rN, r4N = results[args.n], results[4 * args.n]
    eff_total = (r4N["points_per_sec"] / rN["points_per_sec"]) / 4
    eff_rollup = (
        r4N["rollup_points_per_sec"] / rN["rollup_points_per_sec"]
    ) / 4
    eff_prepare = (
        r4N["prepare_points_per_sec"] / rN["prepare_points_per_sec"]
    ) / 4
    tier_eff = {
        t: round(
            (r4N["tiers"][t]["points_per_sec"] / rN["tiers"][t]["points_per_sec"])
            / 4,
            3,
        )
        for t in rN["tiers"]
    }
    summary = {
        "rows": rN["input_rows"],
        "n_cores": args.n,
        "rollup_throughput_N": rN["rollup_points_per_sec"],
        "rollup_throughput_4N": r4N["rollup_points_per_sec"],
        "efficiency_rollup": round(eff_rollup, 3),
        "efficiency_prepare": round(eff_prepare, 3),
        "throughput_N": rN["points_per_sec"],
        "throughput_4N": r4N["points_per_sec"],
        "efficiency_total": round(eff_total, 3),
        "tier_efficiency": tier_eff,
        "tiers_N": rN["tiers"],
        "tiers_4N": r4N["tiers"],
    }
    write_report(summary, rN, r4N, args)
    print(json.dumps(summary))


def write_report(summary, rN, r4N, args):
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lines = [
        "# BENCH/BASELINE.md — scaling + throughput evidence",
        "",
        "Protocol (BASELINE.md): identical `spark-submit --py-files engine.zip",
        "rollup_job.py` on the same deterministic synthetic corpus at two",
        f"parallelism levels — local[{args.n}] (N) vs local[{4*args.n}] (4N) — fresh JVM each.",
        "",
        f"- corpus: {rN['input_rows']:,} pre-tokenized sequences "
        f"(synth seed 42, gap-punched, skewed source s0)",
        "- job: split → z-score(train-only) → MA-unbias → salted 5m/1h/1d",
        "  rollup tree → gap-fill → checkpointed per-source writes →",
        "  Gorilla/delta-of-delta block compression",
        "",
        "## Rollup throughput (the BASELINE metric: rolled-up points/sec)",
        "",
        "| config | rollup pts/s | prepare pts/s | total wall s |",
        "|---|---|---|---|",
        f"| local[{args.n}] (N) | {rN['rollup_points_per_sec']:,} |"
        f" {rN['prepare_points_per_sec']:,} | {rN['total_seconds']} |",
        f"| local[{4*args.n}] (4N) | {r4N['rollup_points_per_sec']:,} |"
        f" {r4N['prepare_points_per_sec']:,} | {r4N['total_seconds']} |",
        "",
        f"**Rollup scaling efficiency: {summary['efficiency_rollup']}**"
        f" (criterion ≥ 0.8 → {'PASS' if summary['efficiency_rollup'] >= 0.8 else 'MISS'});"
        f" preprocessing stage efficiency {summary['efficiency_prepare']};"
        f" whole-job efficiency {summary['efficiency_total']}"
        " (includes fixed per-job overhead: session, counts, manifests).",
        "",
        "## Per retention tier (points/sec = tier input points / tier seconds)",
        "",
        "| tier | N pts/s | 4N pts/s | efficiency |",
        "|---|---|---|---|",
    ]
    for t in rN["tiers"]:
        lines.append(
            f"| {t} | {rN['tiers'][t]['points_per_sec']:,} |"
            f" {r4N['tiers'][t]['points_per_sec']:,} |"
            f" {summary['tier_efficiency'][t]} |"
        )
    lines += [
        "",
        "Caveats: single-host local mode shares one memory bus and page cache",
        "across 'executors'; per-tier numbers at coarse tiers are dominated by",
        "fixed job overhead (tiny inputs), so the end-to-end efficiency is the",
        "meaningful criterion. Rerun: `python tools/scaling_bench.py`.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
