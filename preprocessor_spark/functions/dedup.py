"""Deduplication suite for document corpora — exact, word-set, MinHash+LSH,
SimHash, n-gram Jaccard verification, embedding-cosine near-dup.

All set/hash machinery is native Spark expressions (xxhash64, array ops);
the only pandas stage is the SimHash bit-vote (numpy-vectorized per Arrow
batch). Scale notes per operator are inline — the unifying principle: never
materialize O(n²) candidate pairs; LSH band-bucket joins bound candidates to
colliding buckets only, and every self-join keys on a hash bucket so AQE can
handle bucket skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from preprocessor_spark.functions.text import words


# ------------------------------------------------------------------ exact
def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per exact text: one groupBy on the text
    hash (shuffle carries only (hash, id), not the payload), then a
    broadcast-ready semi-join back for the full rows."""
    keep = (
        df.select(F.xxhash64(text_col).alias("__h"), F.col(id_col))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, on=id_col, how="left_semi")


def duplicate_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-corpus duplicate accounting (reference A6 analog,
    app/core/data_handler.py:413-415)."""
    return (
        df.groupBy(F.xxhash64(text_col).alias("__h"))
        .agg(F.count(F.lit(1)).alias("copies"))
        .agg(
            F.count(F.lit(1)).alias("distinct_texts"),
            F.sum("copies").alias("total_docs"),
            F.sum(F.col("copies") - 1).alias("duplicate_docs"),
        )
    )


# --------------------------------------------------------------- word-set
def dedup_word_set(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Jaccard==1.0 dedup: documents with identical word SETS collapse to
    the lowest id (order/multiplicity-insensitive)."""
    key = F.xxhash64(F.array_sort(F.array_distinct(words(text_col))))
    keep = (
        df.select(key.alias("__h"), F.col(id_col))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, on=id_col, how="left_semi")


# ---------------------------------------------------------------- shingles
def char_shingles(text_col: str = "text", k: int = 5) -> F.Column:
    """Distinct k-char shingles as an array of 64-bit hashes — native
    transform over a positions sequence."""
    t = F.lower(F.col(text_col))
    n = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.xxhash64(F.substring(t, i, k)))
    )


def word_shingles(text_col: str = "text", k: int = 3) -> F.Column:
    ws = words(text_col)
    n = F.size(ws)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.xxhash64(F.slice(ws, i, k))))


# ------------------------------------------------------------ MinHash + LSH
def minhash_signature(shingles: F.Column, num_hashes: int = 64) -> F.Column:
    """num_hashes-wide MinHash signature: min over xxhash64(shingle, seed_i).

    Shape matters: ONE transform producing a 64-hash array per shingle, then
    an elementwise-min fold. The naive `array(*[array_min(transform(...))
    for i in 64])` references the shingle expression 64 times — Catalyst's
    CollapseProject inlines it and recomputes the shingles 64x per row.
    Here the shingle column appears exactly once, so the plan stays linear
    in |shingles| regardless of projection collapsing. No UDF, no explode."""
    per_shingle = F.transform(
        shingles,
        lambda s: F.array(*[F.xxhash64(s, F.lit(i)) for i in range(num_hashes)]),
    )
    init = F.array(*[F.lit((1 << 63) - 1).cast("long")] * num_hashes)
    return F.aggregate(
        per_shingle,
        init,
        lambda acc, h: F.zip_with(acc, h, lambda a, b: F.least(a, b)),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.7,
    shingle_mode: str = "char",
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding:
      shingle → signature → band-hash → self-join per band bucket →
      exact-Jaccard verification on the colliding candidates only.

    Scale: the self-join keys on (band_id, band_hash) so only colliding
    docs meet; candidate verification re-computes true Jaccard from the
    shingle arrays carried with each side. ~(threshold, bands, rows/band)
    tuned by the standard S-curve 1-(1-s^r)^b."""
    rows_per_band = num_hashes // bands
    mk_shingles = char_shingles if shingle_mode == "char" else word_shingles
    # lift single-small-file inputs to full parallelism before the CPU-heavy
    # shingle+signature projection (shuffles only raw text, once)
    target_parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target_parts:
        df = df.repartition(target_parts, id_col)
    base = df.select(
        F.col(id_col),
        mk_shingles(text_col, shingle_k).alias("__sh"),
    ).persist()  # shingles feed the signature AND both verification sides
    # signature via explode + 64 codegen'd min-aggregates: higher-order
    # array lambdas (transform/aggregate/zip_with) run on the INTERPRETED
    # expression path — an order of magnitude slower than whole-stage
    # codegen. The exploded shape keeps every xxhash64 + min inside
    # codegen, and the partial (map-side) agg collapses each task to one
    # row per doc before the shuffle. Values are bit-identical to
    # minhash_signature (same xxhash64(shingle_hash, seed_i) lattice).
    exploded = base.select(F.col(id_col), F.explode("__sh").alias("__s"))
    sig = (
        exploded.groupBy(id_col)
        .agg(
            *[
                F.min(F.xxhash64("__s", F.lit(i))).alias(f"__h{i}")
                for i in range(num_hashes)
            ]
        )
        .select(
            id_col,
            F.array(*[f"__h{i}" for i in range(num_hashes)]).alias("__sig"),
        )
    )
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("__sig", b * rows_per_band + 1, rows_per_band)
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band"),
    ).select(id_col, "__band.band", "__band.bh")
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bh") == F.col("r.bh"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # verification: attach shingles to the (few) surviving candidates only
    sh_a = base.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a"))
    sh_b = base.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ----------------------------------------------------------------- SimHash
def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document: per-word xxhash64, bit-vote, sign.
    Vectorized numpy inside mapInPandas (bit unpacking of 64-bit lanes is
    not expressible as native Spark array ops without 64 aggregates/row)."""
    src = df.select(id_col, words(text_col).alias("__ws"))
    out_schema = T.StructType(
        [src.schema[id_col], T.StructField("simhash", T.LongType())]
    )

    def compute(iterator):
        for pdf in iterator:
            ids, sims = [], []
            for i, ws in zip(pdf[id_col], pdf["__ws"]):
                ws = [w for w in ws if w]
                if not ws:
                    ids.append(i)
                    sims.append(0)
                    continue
                # stable 64-bit word hashes (FNV-1a — process-independent)
                h = np.array([hash64(w) for w in ws], dtype=np.uint64)
                bits = (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                sim = int(
                    np.bitwise_or.reduce(
                        (votes > 0).astype(np.uint64)
                        << np.arange(64, dtype=np.uint64)
                    )
                )
                if sim >= 1 << 63:  # reinterpret as signed for LongType
                    sim -= 1 << 64
                ids.append(i)
                sims.append(sim)
            yield pd.DataFrame({id_col: ids, "simhash": np.array(sims, np.int64)})

    return src.mapInPandas(compute, out_schema)


def hash64(w: str) -> int:
    """Deterministic unsigned 64-bit FNV-1a string hash — stable across
    processes (Python's builtin hash() is salted per process, unusable)."""
    h = 0xCBF29CE484222325
    for b in w.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs by SimHash: block on 4×16-bit chunks (any
    pair within hamming ≤ 3 of 64 bits shares ≥ one identical 16-bit chunk
    by pigeonhole), verify hamming on candidates."""
    sh = simhash(df, text_col, id_col)
    chunks = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("__c"),
    ).select(id_col, "simhash", "__c.ci", "__c.cv")
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            on=[
                F.col("l.ci") == F.col("r.ci"),
                F.col("l.cv") == F.col("r.cv"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


# ------------------------------------------------- embedding cosine near-dup
def embedding_near_dups(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate vectors: random-hyperplane LSH bucket join + exact
    cosine verification. Hyperplanes are derived deterministically from
    (seed, plane, dim) hashes — no driver-side random state to broadcast."""
    from preprocessor_spark.functions.similarity import cosine, lsh_bucket

    base = df.select(id_col, emb_col).withColumn(
        "__bucket", lsh_bucket(F.col(emb_col), num_planes, seed)
    )
    l, r = base.alias("l"), base.alias("r")
    cand = l.join(
        r,
        on=[
            F.col("l.__bucket") == F.col("r.__bucket"),
            F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
        ],
    ).select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        cosine(F.col(f"l.{emb_col}"), F.col(f"r.{emb_col}")).alias("cosine"),
    )
    return cand.filter(F.col("cosine") >= threshold)
