"""Large-SF near-dup dedup bench: minhash/simhash timing + bucket-size
histograms (the band-join skew evidence the 100-TB story leans on).

The driver testdata tops out at sf0.1 (5k documents), so this bench
synthesizes a deterministic documents table at ~sf1+ scale (default 50k
docs, --rows to scale further): text is a pure function of doc_id
(xxhash64-derived words over a small vocab, like the testdata's), and a
deterministic ~7% of docs are near-duplicates of an EARLIER doc (same
pure-function text re-derived from the base id with one word substituted
— no self-join needed to construct correlated docs).

Records BENCH/dedup_scale.json + BENCH/DEDUP_SCALE.md:
  - wall seconds + docs/sec for minhash_lsh_pairs and simhash_near_dups,
  - verified pair counts,
  - bucket-size histograms of the EXACT self-join keys (minhash band
    buckets, simhash 15-bit chunk buckets) in log2 size classes, plus the
    largest bucket — the quantity that decides whether the candidate join
    explodes at scale (a bucket of size B costs B^2 candidate rows),
  - a char-shingle "pathology" histogram at small size: this corpus's
    64-word vocabulary makes char-5-grams collide across unrelated docs,
    demonstrating the histogram catching a super-linear candidate join
    BEFORE it runs (minhash itself defaults to word shingles here).

Usage: python tools/dedup_scale_bench.py [--rows 50000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "query", "agg", "table", "hash", "stream",
    "key", "group", "filter", "customer", "vector", "slow", "join", "merge",
    "shuffle", "broadcast", "cache", "spill", "codec", "page", "row", "plan",
    "stage", "task", "block", "index", "range", "split", "token", "write",
    "read", "sink", "source", "tier", "bucket", "window", "gap", "fill",
    "skew", "salt", "prune", "push", "fold", "cast", "span", "chunk",
    "frame", "state", "event", "late", "exact", "near", "dup", "pair",
]


def synth_documents(spark, n_rows: int, seed: int = 42, vocab_size: int = 64):
    """Deterministic documents table: (doc_id, text). ~7% of rows with
    doc_id >= 64 are near-duplicates of doc_id - (h%63+1) with one word
    replaced; text(i) is a pure column function of i, so the duplicate's
    base text is re-derived, never joined.

    ``vocab_size`` controls the word universe: 64 (the default) draws from
    the legacy VOCAB list (bit-identical to every recorded bench), any
    other size derives words as ``w<hash mod vocab_size>`` — a heavy-tailed
    -free uniform vocabulary used to separate blocking-scheme scaling from
    the 64-word saturation artifact (word-level simhash signatures cluster
    when every doc contains most of a tiny vocabulary)."""
    from pyspark.sql import functions as F

    df = spark.range(n_rows).withColumnRenamed("id", "_i")
    h = lambda *cols: F.abs(F.xxhash64(F.lit(seed), *cols))  # noqa: E731
    vocab = F.array(*[F.lit(w) for w in VOCAB])

    is_dup = (h(F.col("_i"), F.lit("dup")) % 14 == 0) & (F.col("_i") >= 64)
    base = F.when(
        is_dup, F.col("_i") - (h(F.col("_i"), F.lit("off")) % 63 + 1)
    ).otherwise(F.col("_i"))
    if vocab_size == len(VOCAB):
        word = lambda hh: F.element_at(  # noqa: E731
            vocab, (hh % len(VOCAB) + 1).cast("int")
        )
    else:
        word = lambda hh: F.concat(  # noqa: E731
            F.lit("w"), (hh % vocab_size).cast("string")
        )
    # length 40..167 words, derived from the BASE id so dup pairs align
    length = (h(base, F.lit("len")) % 128 + 40).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), length),
        lambda j: word(h(base, j)),
    )
    # dups substitute ONE word position (re-derived, not copied)
    mut_pos = (h(F.col("_i"), F.lit("pos")) % length + 1).cast("int")
    mut_word = word(h(F.col("_i"), F.lit("w")))
    words = F.when(
        is_dup,
        F.transform(
            words, lambda w, i: F.when(i + 1 == mut_pos, mut_word).otherwise(w)
        ),
    ).otherwise(words)
    return df.select(
        F.col("_i").alias("doc_id"), F.array_join(words, " ").alias("text")
    )


def synth_embeddings(spark, n_rows: int, dim: int = 16, seed: int = 42):
    """Deterministic embeddings table: (vec_id, embedding double[dim]).
    Same planted-duplicate scheme as :func:`synth_documents`: ~7% of rows
    with vec_id >= 64 perturb the (re-derived, never joined) embedding of
    vec_id − (h%63+1) by ~1% component noise — cosine ≥ ~0.999 planted
    near-dups in an otherwise near-orthogonal uniform cloud."""
    from pyspark.sql import functions as F

    df = spark.range(n_rows).withColumnRenamed("id", "_i")
    h = lambda *cols: F.abs(F.xxhash64(F.lit(seed), *cols))  # noqa: E731
    is_dup = (h(F.col("_i"), F.lit("dup")) % 14 == 0) & (F.col("_i") >= 64)
    base = F.when(
        is_dup, F.col("_i") - (h(F.col("_i"), F.lit("off")) % 63 + 1)
    ).otherwise(F.col("_i"))

    def comp(d):
        v = (h(base, F.lit(f"e{d}")) % 2_000_001).cast("double") / 1e6 - 1.0
        noise = (
            (h(F.col("_i"), F.lit(f"n{d}")) % 2001).cast("double") / 1e3 - 1.0
        ) * 0.02
        return F.when(is_dup, v + noise).otherwise(v)

    emb = F.array(*[comp(d) for d in range(dim)])
    return df.select(F.col("_i").alias("vec_id"), emb.alias("embedding"))


def bucket_histogram(keys, group_cols):
    """log2 size-class histogram of self-join bucket sizes + the max."""
    from pyspark.sql import functions as F

    sizes = keys.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    hist = {
        int(r["c"]): int(r["cnt"])
        for r in sizes.groupBy(
            F.floor(F.log2("n")).cast("int").alias("c")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    top = sizes.agg(
        F.max("n").alias("mx"), F.count(F.lit(1)).alias("n_buckets")
    ).collect()[0]
    return {
        "log2_size_class_counts": {str(k): hist[k] for k in sorted(hist)},
        "max_bucket": int(top["mx"]),
        "n_buckets": int(top["n_buckets"]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    )
    ap.add_argument(
        "--shingle-mode",
        default="word",
        choices=["word", "char"],
        help="shingle mode for the minhash run. This synthetic corpus draws "
        "from a 64-word vocabulary, so char-5-grams span a tiny universe and "
        "UNRELATED docs share most of it (baseline Jaccard ~0.2-0.3) — band "
        "buckets then grow with corpus size and the candidate join explodes "
        "(the exact failure mode the histograms exist to catch; see the "
        "pathology section of the report). Word shingles distinguish the "
        "constructed one-word-substituted near-dups correctly.",
    )
    ap.add_argument("--shingle-k", type=int, default=3)
    ap.add_argument(
        "--char-pathology-rows",
        type=int,
        default=5_000,
        help="also run char-mode minhash at this small size and record its "
        "bucket histogram as the worked example of the skew diagnostic "
        "firing (0 disables)",
    )
    ap.add_argument(
        "--growth-rows",
        type=int,
        default=0,
        help="also compute the band/chunk bucket histograms (signature "
        "stage only — no candidate join) at this SECOND corpus size and "
        "record max-bucket growth factors vs --rows: the direct evidence "
        "for how each blocking scheme's candidate join scales (0 disables; "
        "use ~4x --rows)",
    )
    args = ap.parse_args()

    import sys

    sys.path.insert(0, REPO)
    from preprocessor_spark import get_spark
    from preprocessor_spark.functions.dedup import (
        minhash_band_keys,
        minhash_lsh_pairs,
        release_caches,
        simhash_block_keys,
        simhash_chunk_keys,
        simhash_near_dups,
    )

    spark = get_spark("dedup_scale", master=f"local[{args.cpus}]", batch_committer_v2=True)
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_documents(spark, args.rows).persist()
    n = docs.count()  # materialize the corpus outside the timed windows

    result = {
        "rows": n,
        "cpus": args.cpus,
        "shingle_mode": args.shingle_mode,
        "shingle_k": args.shingle_k,
    }

    t0 = time.perf_counter()
    mh = minhash_lsh_pairs(
        docs, shingle_mode=args.shingle_mode, shingle_k=args.shingle_k
    )
    mh_pairs = mh.count()
    mh_dt = round(time.perf_counter() - t0, 3)
    sig = mh._attached_caches[1]
    result["minhash"] = {
        "seconds": mh_dt,
        "docs_per_sec": round(n / mh_dt),
        "verified_pairs": mh_pairs,
        "band_buckets": bucket_histogram(
            minhash_band_keys(sig), ["band", "bh"]
        ),
    }
    release_caches(mh)

    t0 = time.perf_counter()
    sh = simhash_near_dups(docs)
    sh_pairs = sh.count()
    sh_dt = round(time.perf_counter() - t0, 3)
    sig_sh = sh._attached_caches[0]
    result["simhash"] = {
        "seconds": sh_dt,
        "docs_per_sec": round(n / sh_dt),
        "candidate_pairs": sh_pairs,
        # the operator's ACTUAL blocking (combinatorial subset keys)
        "block_buckets": bucket_histogram(
            simhash_block_keys(sig_sh), ["ci", "cv"]
        ),
        # the single-slice legacy scheme, kept for comparison: its largest
        # bucket grows ~linearly with corpus (the round-4 measured wall)
        "chunk_buckets": bucket_histogram(
            simhash_chunk_keys(sig_sh), ["ci", "cv"]
        ),
    }
    release_caches(sh)

    # ---- embedding near-dup: hyperplane-bucket histograms --------------
    # The bucket count of p-plane SRP-LSH is 2^p PER TABLE, so at fixed p
    # the expected random-collision bucket grows LINEARLY with the corpus
    # (n/2^p) — measured below at p=8 vs p=16 to show that num_planes must
    # scale with log2(n), with the recall lost to wider signatures bought
    # back by more tables (embedding_near_dups num_tables).
    from preprocessor_spark.functions.dedup import (
        embedding_bucket_keys,
        embedding_near_dups,
    )

    EMB_DIM = 16
    emb = synth_embeddings(spark, args.rows, dim=EMB_DIM).persist()
    emb.count()
    t0 = time.perf_counter()
    ed_pairs = embedding_near_dups(
        emb, threshold=0.99, num_planes=16, dim=EMB_DIM, num_tables=4
    ).count()
    ed_dt = round(time.perf_counter() - t0, 3)
    result["embedding"] = {
        "seconds": ed_dt,
        "docs_per_sec": round(n / ed_dt),
        "verified_pairs": ed_pairs,
        "dim": EMB_DIM,
        "bucket_buckets_p8": bucket_histogram(
            embedding_bucket_keys(emb, num_planes=8, dim=EMB_DIM),
            ["ti", "bv"],
        ),
        "bucket_buckets_p16": bucket_histogram(
            embedding_bucket_keys(emb, num_planes=16, dim=EMB_DIM),
            ["ti", "bv"],
        ),
    }
    emb.unpersist()

    # The worked example of the diagnostic FIRING: char-k-grams over this
    # corpus's 64-word vocabulary span a tiny shingle universe, so unrelated
    # docs share most shingles and band buckets grow with the corpus — the
    # exact super-linear candidate-join failure the histogram exists to
    # catch before a 100-TB run does. Recorded at a deliberately small size
    # (the signature stage alone is cheap; only the candidate join is not,
    # and we never run it here — keys only).
    if args.growth_rows:
        # bucket growth from --rows to --growth-rows, signature stages only:
        # how does the largest bucket scale with corpus size? Minhash band
        # keys collide only under genuine similarity (expected ~constant /
        # duplicate-cluster-bound buckets); simhash 15-bit chunk buckets
        # are pigeonhole slices, so they grow LINEARLY and the chunk join
        # is O(n²/2^15·4) — fine at this scale, but at 10^9+ docs the
        # blocking needs more/finer chunks. Record it rather than assert it.
        gdocs = synth_documents(spark, args.growth_rows).persist()
        gdocs.count()
        gmh = minhash_lsh_pairs(
            gdocs, shingle_mode=args.shingle_mode, shingle_k=args.shingle_k
        )
        gsig = gmh._attached_caches[1]
        g_band = bucket_histogram(minhash_band_keys(gsig), ["band", "bh"])
        release_caches(gmh)
        gsh = simhash_near_dups(gdocs)
        gsig_sh = gsh._attached_caches[0]
        g_block = bucket_histogram(simhash_block_keys(gsig_sh), ["ci", "cv"])
        g_chunk = bucket_histogram(simhash_chunk_keys(gsig_sh), ["ci", "cv"])
        release_caches(gsh)
        gdocs.unpersist()
        gemb = synth_embeddings(spark, args.growth_rows, dim=EMB_DIM).persist()
        gemb.count()
        g_emb8 = bucket_histogram(
            embedding_bucket_keys(gemb, num_planes=8, dim=EMB_DIM),
            ["ti", "bv"],
        )
        g_emb16 = bucket_histogram(
            embedding_bucket_keys(gemb, num_planes=16, dim=EMB_DIM),
            ["ti", "bv"],
        )
        # the stated scale rule, MEASURED: fixed-p SRP buckets grow as
        # n/2^p, so p must rise with log2(corpus ratio) to hold expected
        # bucket size flat (recall bought back with more tables). At a 4x
        # corpus that is p+2 — the largest bucket should match the base
        # corpus's p=16 figure, not grow 4x like fixed-p above.
        import math

        p_scaled = 16 + max(1, round(math.log2(args.growth_rows / n)))
        g_emb_scaled = bucket_histogram(
            embedding_bucket_keys(gemb, num_planes=p_scaled, dim=EMB_DIM),
            ["ti", "bv"],
        )
        gemb.unpersist()
        base_band = result["minhash"]["band_buckets"]["max_bucket"]
        base_block = result["simhash"]["block_buckets"]["max_bucket"]
        base_chunk = result["simhash"]["chunk_buckets"]["max_bucket"]
        result["bucket_growth"] = {
            "rows": args.growth_rows,
            "corpus_ratio": round(args.growth_rows / n, 2),
            "minhash_band_buckets": g_band,
            "simhash_block_buckets": g_block,
            "simhash_chunk_buckets": g_chunk,
            "max_band_bucket_growth": round(g_band["max_bucket"] / base_band, 2),
            "max_block_bucket_growth": round(
                g_block["max_bucket"] / base_block, 2
            ),
            "max_chunk_bucket_growth": round(
                g_chunk["max_bucket"] / base_chunk, 2
            ),
            "embedding_buckets_p8": g_emb8,
            "embedding_buckets_p16": g_emb16,
            "max_emb_p8_bucket_growth": round(
                g_emb8["max_bucket"]
                / result["embedding"]["bucket_buckets_p8"]["max_bucket"],
                2,
            ),
            "max_emb_p16_bucket_growth": round(
                g_emb16["max_bucket"]
                / result["embedding"]["bucket_buckets_p16"]["max_bucket"],
                2,
            ),
            "embedding_planes_scaled": p_scaled,
            "embedding_buckets_p_scaled": g_emb_scaled,
            # growth of the SCALED-p largest bucket vs the BASE corpus's
            # p=16 largest bucket: ~1.0 demonstrates the log2 plane rule
            "max_emb_scaled_bucket_growth": round(
                g_emb_scaled["max_bucket"]
                / result["embedding"]["bucket_buckets_p16"]["max_bucket"],
                2,
            ),
        }

    if args.char_pathology_rows:
        pn = args.char_pathology_rows
        pdocs = synth_documents(spark, pn).persist()
        pdocs.count()
        pmh = minhash_lsh_pairs(pdocs, shingle_mode="char", shingle_k=5)
        psig = pmh._attached_caches[1]
        result["char_pathology"] = {
            "rows": pn,
            "band_buckets": bucket_histogram(
                minhash_band_keys(psig), ["band", "bh"]
            ),
        }
        release_caches(pmh)
        pdocs.unpersist()

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "dedup_scale.json"), "w") as f:
        json.dump(result, f, indent=1)

    mb = result["minhash"]["band_buckets"]
    sb = result["simhash"]["block_buckets"]
    sc = result["simhash"]["chunk_buckets"]
    e8 = result["embedding"]["bucket_buckets_p8"]
    e16 = result["embedding"]["bucket_buckets_p16"]
    lines = [
        "# BENCH/DEDUP_SCALE.md — near-dup dedup at large SF",
        "",
        f"Corpus: {n:,} deterministic synthetic documents "
        "(~7% near-duplicates by construction: one word substituted in a "
        f"re-derived earlier doc), local[{args.cpus}]. Minhash runs on "
        f"{args.shingle_mode}-{args.shingle_k} shingles — this corpus draws "
        "from a 64-word vocabulary, so word shingles span a large universe "
        "(unrelated docs share ~nothing) while char shingles would not "
        "(see the pathology section).",
        "",
        "| op | wall s | docs/s | pairs |",
        "|---|---|---|---|",
        f"| minhash_lsh_pairs (64 hashes, 16 bands, verified J≥0.7) |"
        f" {result['minhash']['seconds']} |"
        f" {result['minhash']['docs_per_sec']:,} |"
        f" {result['minhash']['verified_pairs']:,} |",
        f"| simhash_near_dups (60-bit, hamming≤3, C(6,3) 30-bit blocks) |"
        f" {result['simhash']['seconds']} |"
        f" {result['simhash']['docs_per_sec']:,} |"
        f" {result['simhash']['candidate_pairs']:,} |",
        f"| embedding_near_dups (dim 16, p=16 planes × L=4 tables, cos≥0.99) |"
        f" {result['embedding']['seconds']} |"
        f" {result['embedding']['docs_per_sec']:,} |"
        f" {result['embedding']['verified_pairs']:,} |",
        "",
        "## Self-join bucket-size distributions (skew evidence)",
        "",
        "A bucket of size B contributes ~B^2/2 candidate pairs to the",
        "blocking self-join; the histograms below (log2 size classes →",
        "bucket counts) show whether any bucket grows super-linearly with",
        "the corpus — the failure mode that would break the join at 100 TB.",
        "",
        f"- minhash band buckets: {mb['n_buckets']:,} buckets, largest ="
        f" {mb['max_bucket']}, histogram {mb['log2_size_class_counts']}",
        f"- simhash block buckets (C(6,3)×30-bit, the operator's keys):"
        f" {sb['n_buckets']:,} buckets, largest = {sb['max_bucket']},"
        f" histogram {sb['log2_size_class_counts']}",
        f"- simhash legacy 4×15-bit chunk buckets (comparison):"
        f" {sc['n_buckets']:,} buckets, largest = {sc['max_bucket']:,},"
        f" histogram {sc['log2_size_class_counts']}",
        f"- embedding hyperplane buckets p=8 (256/table):"
        f" {e8['n_buckets']:,} buckets, largest = {e8['max_bucket']:,},"
        f" histogram {e8['log2_size_class_counts']}",
        f"- embedding hyperplane buckets p=16 (65,536/table):"
        f" {e16['n_buckets']:,} buckets, largest = {e16['max_bucket']:,},"
        f" histogram {e16['log2_size_class_counts']}",
        "",
        "Band keys concatenate 4 minhash values (collision only under",
        "genuine similarity) and simhash block keys are 30-bit",
        "slice-subsets, so both stay duplicate-cluster-bound; a",
        "pathological hot bucket (e.g. empty docs) would surface here",
        "first. Hyperplane buckets number only 2^p per table — p must",
        "scale with log2(corpus) (recall bought back with more tables:",
        "1−(1−(1−θ/π)^p)^L). AQE skew-join splitting handles residual",
        "imbalance at cluster scale.",
    ]
    if "bucket_growth" in result:
        g = result["bucket_growth"]
        gb, gc = g["minhash_band_buckets"], g["simhash_chunk_buckets"]
        gs = g["simhash_block_buckets"]
        ge8, ge16 = g["embedding_buckets_p8"], g["embedding_buckets_p16"]
        lines += [
            "",
            "## Bucket growth with corpus size (signature stages only)",
            "",
            f"Same histograms at {g['rows']:,} docs ({g['corpus_ratio']}x "
            "the corpus):",
            "",
            f"- minhash band buckets: largest = {gb['max_bucket']} "
            f"(**{g['max_band_bucket_growth']}x** at {g['corpus_ratio']}x "
            f"corpus), {gb['n_buckets']:,} buckets, histogram "
            f"{gb['log2_size_class_counts']}",
            f"- simhash block buckets (C(6,3)×30-bit, the operator's keys): "
            f"largest = {gs['max_bucket']:,} "
            f"(**{g['max_block_bucket_growth']}x** at {g['corpus_ratio']}x "
            f"corpus), {gs['n_buckets']:,} buckets, histogram "
            f"{gs['log2_size_class_counts']}",
            f"- simhash legacy 4×15-bit chunk buckets: largest = "
            f"{gc['max_bucket']:,} "
            f"(**{g['max_chunk_bucket_growth']}x** at {g['corpus_ratio']}x "
            f"corpus), {gc['n_buckets']:,} buckets, histogram "
            f"{gc['log2_size_class_counts']}",
            f"- embedding buckets p=8: largest = {ge8['max_bucket']:,} "
            f"(**{g['max_emb_p8_bucket_growth']}x**), p=16: largest = "
            f"{ge16['max_bucket']:,} (**{g['max_emb_p16_bucket_growth']}x**)",
            f"- embedding buckets p={g['embedding_planes_scaled']} (the "
            f"log2-scaled plane count for this corpus ratio): largest = "
            f"{g['embedding_buckets_p_scaled']['max_bucket']:,} — "
            f"**{g['max_emb_scaled_bucket_growth']}x** the BASE corpus's "
            f"p=16 largest vs {g['max_emb_p16_bucket_growth']}x at fixed "
            f"p. Scaling p with log2(n) holds EXPECTED occupancy (n/2^p) "
            f"exactly flat; the largest bucket is the widest solid-angle "
            f"cell of the random planes, which each added plane splits, so "
            f"it shrinks more slowly — grow p slightly faster than log2(n) "
            f"(or multi-probe) to pin the max too. Recall at bigger p is "
            f"bought back with more tables: 1−(1−(1−θ/π)^p)^L",
            "",
            "Band buckets collide only under genuine similarity, so the",
            "largest stays duplicate-cluster-bound (sub-linear growth → the",
            "band join scales ~linearly in corpus size). The simhash",
            "30-bit slice-subset blocks (the round-5 second blocking level)",
            "replace the legacy 15-bit chunks whose largest bucket grew",
            "~linearly (O(n²/2^15·4) candidates — re-measured above for",
            "comparison); the subset keys push random collisions to",
            "O(n²/2^30·20). Fixed-p hyperplane buckets grow linearly by",
            "construction (n/2^p expected): at 10^8+ docs raise p with",
            "log2(n) and recover recall with more tables.",
            "",
            "Caveat on simhash's absolute numbers here: simhash votes on",
            "WORD hashes, and every doc in this corpus contains most of the",
            "64-word vocabulary, so signatures cluster tightly and the",
            "hamming≤3 pair count inflates super-linearly — a feature-",
            "granularity artifact of the synthetic corpus (real corpora",
            "have heavy-tailed vocabularies), the same family of config",
            "mismatch as the char-shingle pathology below. Weighted or",
            "shingle-level features are the fix on vocab-limited corpora.",
            "Measured directly in BENCH/SIMHASH_VOCAB.md",
            "(tools/simhash_vocab_probe.py): the same generator with the",
            "word universe widened to 4,096 or 65,536 words holds the",
            "largest block bucket FLAT across the same 4× corpus",
            "(growth 1.0× vs the saturated 64-word vocab's ~4×) — the",
            "subset-blocking scheme is duplicate-cluster-bound; linear",
            "growth above is the saturated-vocabulary corpus, not the",
            "blocking.",
        ]
    if "char_pathology" in result:
        cp = result["char_pathology"]["band_buckets"]
        cpn = result["char_pathology"]["rows"]
        lines += [
            "",
            "## Worked example: the diagnostic catching a bad config",
            "",
            f"Char-5 shingles over this 64-word-vocabulary corpus at only",
            f"{cpn:,} docs: the shingle universe is so small that unrelated",
            "docs collide in the same band buckets —",
            "",
            f"- largest band bucket = {cp['max_bucket']:,} of {cpn:,} docs"
            f" ({cp['n_buckets']:,} buckets, histogram"
            f" {cp['log2_size_class_counts']}).",
            "",
            "A bucket holding a constant FRACTION of the corpus means the",
            "candidate join is O(n²) — at 100 TB that run must be stopped",
            "before the join, which is exactly what this histogram (computed",
            "from the signature stage alone, cheap) is for. The word-shingle",
            "histogram above is what a healthy configuration looks like on",
            "the same corpus.",
        ]
    lines += [
        "",
        f"Rerun: `python tools/dedup_scale_bench.py --rows {args.rows}"
        f" --shingle-mode {args.shingle_mode} --shingle-k {args.shingle_k}`.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "DEDUP_SCALE.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
