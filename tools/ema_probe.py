#!/usr/bin/env python
"""Paired EMA throughput probe (round-4 VERDICT item 5).

The headline `ema_rows_per_sec` drifted 202k → 166k rows/s between the
round-3 and round-4 bench runs with zero changes to operators/unbiaser.py
— a sub-second wall measurement (100k rows at sf0.1) sitting inside the
host's phase noise. This probe attributes the drift: it runs the exact
bench-protocol EMA query (same session factory, same _consume
materialization, same sf dir) several times in one session and reports
every rep, so engine drift (persistent) separates from host phase
(rep-to-rep scatter).

Writes BENCH/ema_probe.json.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    )
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from bench import EMA_ROWS, _consume
    from preprocessor_spark import get_spark

    sf_name = os.path.basename(args.sf_dir.rstrip("/"))
    ema_rows = EMA_ROWS.get(sf_name, 100_000)
    spark = get_spark("ema_probe", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    q = entry_mod.queries()["ema_unbias"]

    walls = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        n = _consume(q(spark, args.sf_dir))
        walls.append(round(time.perf_counter() - t0, 3))
        print(f"rep {i}: {walls[-1]} s ({n} rows)", flush=True)

    # drop rep 0 (cold plan/JIT) when there is more than one rep
    srt = sorted(walls[1:] if len(walls) > 1 else walls)
    # position in the suite varies — steady-state reps are the comparable set
    median = srt[len(srt) // 2]
    out = {
        "sf_dir": args.sf_dir,
        "ema_rows": ema_rows,
        "per_rep_wall_s": walls,
        "steady_state_median_wall_s": median,
        "steady_state_median_rows_per_sec": round(ema_rows / median),
        "per_rep_rows_per_sec": [round(ema_rows / w) for w in walls],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ema_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
