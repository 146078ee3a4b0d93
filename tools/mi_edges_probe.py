"""Measure WHY mutual_information defaults to approx_percentile bin edges.

Exact `percentile` builds a value→count OpenHashMap per task and merges
them at one final reducer — cost and memory scale with the column's
DISTINCT count, not its row count. `approx_percentile` is a fixed-size
mergeable sketch. This probe times both on the same synthetic column at
two sizes × two cardinality regimes and writes BENCH/MI_EDGES.md +
BENCH/mi_edges.json. Deterministic (hash-derived values, no RNG state).

Run: python tools/mi_edges_probe.py [--rows 2000000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--scale", type=int, default=4, help="big size = rows*scale")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from preprocessor_spark import get_spark

    spark = get_spark("mi_edges_probe")
    spark.sparkContext.setLogLevel("ERROR")
    probs = ", ".join(str(i / 8) for i in range(1, 8))

    def synth(n: int):
        # hash-derived uniform double; low-card regime rounds it to ~1000
        # distinct values, high-card keeps every value unique
        base = spark.range(n).select(
            (
                (F.xxhash64("id").cast("double") / F.lit(float(2**63)) + 1.0) / 2.0
            ).alias("u")
        )
        return base.select(
            F.round(F.col("u") * 500.0, 1).alias("low_card"),
            F.col("u").alias("high_card"),
        )

    def best_of(df, expr: str) -> float:
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df.agg(F.expr(expr)).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    results: dict[str, dict] = {}
    for label, n in (("n", args.rows), ("%dn" % args.scale, args.rows * args.scale)):
        df = synth(n).persist()
        df.count()  # materialize once so the agg timings exclude the synth
        row = {}
        for col in ("low_card", "high_card"):
            row[col] = {
                "exact_s": best_of(df, f"percentile({col}, array({probs}))"),
                "sketch_s": best_of(
                    df, f"approx_percentile({col}, array({probs}), 10000)"
                ),
                "distinct": df.select(col).distinct().count(),
            }
        df.unpersist()
        row["rows"] = n
        results[label] = row
        print(json.dumps({label: row}))

    big = "%dn" % args.scale
    summary = {
        "rows_small": args.rows,
        "rows_big": args.rows * args.scale,
        "results": results,
        "exact_growth_high_card": round(
            results[big]["high_card"]["exact_s"]
            / max(results["n"]["high_card"]["exact_s"], 1e-9),
            2,
        ),
        "sketch_growth_high_card": round(
            results[big]["high_card"]["sketch_s"]
            / max(results["n"]["high_card"]["sketch_s"], 1e-9),
            2,
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "mi_edges.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
        f.write("\n")

    lines = [
        "# BENCH/MI_EDGES.md — why MI bin edges default to the sketch",
        "",
        "`mutual_information(edge_method=...)`: exact `percentile` carries a",
        "value→count hashmap per task whose merged size is the column's",
        "DISTINCT count (single-reducer merge); `approx_percentile` is a",
        "fixed-size mergeable sketch (rank error ≤ 1e-4 at accuracy 10000 —",
        "moves a bin edge by a few rows, below the binning quantization).",
        "Probe: `python tools/mi_edges_probe.py` (hash-derived synthetic",
        "column, best-of-%d timings, agg-only — input cached)." % args.reps,
        "",
        "| rows | cardinality | distinct | exact percentile s | approx sketch s |",
        "|---|---|---|---|---|",
    ]
    for label in ("n", big):
        r = results[label]
        for col in ("low_card", "high_card"):
            lines.append(
                f"| {r['rows']:,} | {col} | {r[col]['distinct']:,} |"
                f" {r[col]['exact_s']} | {r[col]['sketch_s']} |"
            )
    lines += [
        "",
        f"High-cardinality growth at {args.scale}× rows: exact"
        f" **{summary['exact_growth_high_card']}×**, sketch"
        f" **{summary['sketch_growth_high_card']}×**. The exact path's cost",
        "tracks distinct count (compare the low-card rows), so on a",
        "10^12-row high-cardinality column it is an unbounded single-reducer",
        "merge; the sketch's cost tracks row count only and its merge state",
        "is constant-size. The oracle-checked `mutual_info` driver query",
        "still pins `edge_method='exact'` (bit-matched to DuckDB",
        "quantile_cont); everything else should use the default.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "MI_EDGES.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
