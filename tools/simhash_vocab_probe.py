#!/usr/bin/env python
"""SimHash block-bucket growth vs vocabulary size.

The main dedup scale bench corpus (tools/dedup_scale_bench.py) draws from
a 64-word vocabulary; every document contains most of it, so WORD-level
simhash signatures cluster tightly and the measured block-bucket growth
conflates two effects: the blocking scheme's collision rate and the
corpus's saturated feature space. This probe separates them: it measures
the largest C(6,3)x30-bit subset-block bucket at two corpus sizes across
several vocabulary sizes (64 = the legacy pathology corpus, then
heavy-vocab corpora where word features actually discriminate).

Expected shape, from the scheme's arithmetic: random 30-bit-key collisions
are O(n^2/2^30) per subset, so on a NON-saturated corpus the largest
bucket is duplicate-cluster-bound and grows sub-linearly with n; on the
64-word corpus signatures collapse to a few values and buckets track n —
a feature-granularity artifact, not a blocking failure.

Writes BENCH/simhash_vocab_probe.json and BENCH/SIMHASH_VOCAB.md.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from dedup_scale_bench import bucket_histogram, synth_documents  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--growth-rows", type=int, default=800_000)
    ap.add_argument(
        "--vocab-sizes", type=int, nargs="+", default=[64, 4096, 65536]
    )
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    )
    args = ap.parse_args()

    from preprocessor_spark import get_spark
    from preprocessor_spark.functions.dedup import (
        release_caches,
        simhash_block_keys,
        simhash_near_dups,
    )

    spark = get_spark("simhash_vocab_probe", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    out = {
        "rows": args.rows,
        "growth_rows": args.growth_rows,
        "corpus_ratio": round(args.growth_rows / args.rows, 2),
        "vocab": {},
    }
    for vs in args.vocab_sizes:
        ent = {}
        for key, n in (("base", args.rows), ("growth", args.growth_rows)):
            docs = synth_documents(spark, n, vocab_size=vs).persist()
            docs.count()
            # signature stage only — same pattern as the growth section of
            # dedup_scale_bench: the block-key histogram materializes the
            # cached signature; the candidate join never runs here
            sh = simhash_near_dups(docs)
            sig = sh._attached_caches[0]
            ent[key] = bucket_histogram(simhash_block_keys(sig), ["ci", "cv"])
            release_caches(sh)
            docs.unpersist()
        ent["max_block_bucket_growth"] = round(
            ent["growth"]["max_bucket"] / ent["base"]["max_bucket"], 2
        )
        out["vocab"][str(vs)] = ent
        print(
            f"vocab={vs}: max bucket {ent['base']['max_bucket']:,} -> "
            f"{ent['growth']['max_bucket']:,} "
            f"({ent['max_block_bucket_growth']}x at "
            f"{out['corpus_ratio']}x corpus)",
            flush=True,
        )

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(
        os.path.join(REPO, "BENCH", "simhash_vocab_probe.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)

    lines = [
        "# BENCH/SIMHASH_VOCAB.md — blocking growth vs vocabulary size",
        "",
        "Largest C(6,3)×30-bit subset-block bucket for word-level SimHash "
        f"at {args.rows:,} vs {args.growth_rows:,} docs "
        f"({out['corpus_ratio']}× corpus), by corpus vocabulary size. "
        "Same synthetic generator as BENCH/DEDUP_SCALE.md with only the "
        "word universe widened (vocab 64 = the legacy corpus):",
        "",
        "| vocab | max bucket @ base | max bucket @ 4× | growth |",
        "|---|---|---|---|",
    ]
    for vs, ent in out["vocab"].items():
        lines.append(
            f"| {int(vs):,} | {ent['base']['max_bucket']:,} | "
            f"{ent['growth']['max_bucket']:,} | "
            f"**{ent['max_block_bucket_growth']}×** |"
        )
    lines += [
        "",
        "Reading: on the 64-word corpus every document contains most of "
        "the vocabulary, word-level signatures cluster onto a few values, "
        "and the largest bucket tracks corpus size — a feature-granularity "
        "artifact (the corpus, not the blocking). With a discriminating "
        "vocabulary the largest bucket is duplicate-cluster-bound and "
        "grows sub-linearly, matching the scheme's O(n²/2³⁰)-per-subset "
        "random-collision arithmetic. At 10⁹+ docs the same lever applies "
        "in reverse: if the feature space saturates (boilerplate-heavy "
        "corpora), switch to shingle-level or weighted features before "
        "widening keys.",
        "",
        "Rerun: `python tools/simhash_vocab_probe.py`.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "SIMHASH_VOCAB.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
