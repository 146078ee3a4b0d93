"""Deterministic synthetic corpus of pre-tokenized training sequences.

Produces the engine's authoritative input table (BASELINE.json ``input_hint``):

    (doc_id: string, tokens: array<int32>, n_tok: int32, source: string, ts: timestamp)

``ts`` is the implicit event time (FIXTURES.md F0: doc-rank-derived, fixed
period per source, with deliberate gaps for gap-fill tests).

Everything is derived from ``spark.range(n)`` ids through pure column
expressions (xxhash64-based), so the corpus is:
  * bit-identical regardless of partition count or executor count
    (required for the N-vs-4N scaling equivalence evidence), and
  * generated distributed — no driver-side materialization, so the same
    generator produces the 10^12-sequence corpus on a real cluster.

Source skew: source ``s0`` receives ~40% of rows (hash buckets 0 and 7-9
of 10 all fold to it; FIXTURES.md F0's deliberately-skewed source) to
exercise salted repartition; the remaining buckets yield s1..s6, so the
corpus carries 7 distinct sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_START = "2020-01-01 00:00:00"
ROWS_PER_MINUTE = 60  # corpus density: sequences arriving per minute, all sources
# 7 distinct sources: buckets 0..6 map to s0..s6 (identity — the modulo
# below never fires on a folded bucket) and 7..9 fold onto s0 for skew.
# The constant was 8, but s7 was unreachable; 7 states the real fan-out
# without changing a single generated value (bucket % 7 == bucket % 8 ==
# bucket for buckets 0..6).
N_SOURCES = 7
VOCAB_SIZE = 50_000
GAP_MODULUS = 37  # (minute, source) cells hashing to 0 mod 37 are dropped → gaps


def token_sequences(
    spark: SparkSession,
    n_rows: int,
    *,
    with_gaps: bool = True,
    seed: int = 42,
    rows_per_minute: int = ROWS_PER_MINUTE,
    len_cap: int | None = None,
) -> DataFrame:
    """Build the deterministic token_sequences table with ``n_rows`` candidate
    rows (slightly fewer after gap-punching when ``with_gaps``).

    Token values and lengths are stable functions of (seed, doc index):
      * source: skewed categorical — hash bucket 0..9, buckets >=7 fold to
        s0 (so s0 ≈ 40% of rows and the corpus spans s0..s6);
      * n_tok:  per-source length regime (distinct spread per source) in
        [4, 4 + min(16*(src+1), len_cap)) — deterministic, no RNG state;
        ``len_cap`` bounds sequence length for scale benchmarks where the
        job reads only n_tok (generation cost is all in the token arrays);
      * tokens: element j = xxhash64(seed, id, j) mod VOCAB_SIZE, as int32;
      * ts:     EPOCH + (id / rows_per_minute) minutes — many sequences per
        (source, minute) so rollup tiers genuinely reduce;
      * gaps:   whole (minute, source) cells punched by hash → every tier
        has missing buckets for gap-fill to repair.
    """
    # Size the range partitions by DATA, not by core count: every row value
    # is a pure function of the id, so partitioning never changes content —
    # but a fixed 32-way split puts n/32 rows in each generation task, and
    # past ~5×10^8 rows the partitioned-parquet write buffers of a 30M-row
    # task exceed the executor heap (measured OOM generating 10^9 rows).
    # ~8M rows per task keeps write memory flat at any corpus size.
    parts = int(
        max(spark.sparkContext.defaultParallelism, n_rows // 8_000_000)
    )
    df = spark.range(0, n_rows, 1, parts).withColumnRenamed("id", "_i")
    h = lambda *cols: F.abs(F.xxhash64(F.lit(seed), *cols))  # noqa: E731

    src_bucket = h(F.col("_i"), F.lit("src")) % 10
    src_idx = F.when(src_bucket >= 7, F.lit(0)).otherwise(
        (src_bucket % N_SOURCES).cast("int")
    )
    minute = (F.col("_i") / rows_per_minute).cast("long")
    df = (
        df.withColumn("source", F.concat(F.lit("s"), src_idx.cast("string")))
        .withColumn("__minute", minute)
        .withColumn(
            "n_tok",
            (
                4
                + (
                    h(F.col("_i"), F.lit("len"))
                    % (
                        F.least(
                            F.lit(len_cap), 16 * (src_idx.cast("long") + 1)
                        )
                        if len_cap is not None
                        else 16 * (src_idx.cast("long") + 1)
                    )
                )
            ).cast("int"),
        )
        .withColumn(
            "tokens",
            F.transform(
                F.sequence(F.lit(1), F.col("n_tok")),
                lambda j: (h(F.col("_i"), j) % VOCAB_SIZE).cast("int"),
            ),
        )
        .withColumn(
            # long epoch arithmetic, NOT make_interval(mins=cast int):
            # the int32 cast overflows past 2^31-1 minutes (~1.29e11 rows)
            # — an ANSI CAST_OVERFLOW crash at exactly the 10^12-sequence
            # scale this generator claims. Bit-identical to the interval
            # form for every in-range minute (verified value-for-value).
            "ts",
            F.timestamp_seconds(
                F.unix_timestamp(F.to_timestamp(F.lit(EPOCH_START)))
                + F.col("__minute") * 60
            ),
        )
        .withColumn("doc_id", F.format_string("doc-%012d", F.col("_i")))
    )
    if with_gaps:
        df = df.filter(
            h(F.col("__minute"), src_idx, F.lit("gap")) % GAP_MODULUS != 0
        )
    return df.select("doc_id", "tokens", "n_tok", "source", "ts")


def write_corpus(spark: SparkSession, path: str, n_rows: int, **kw) -> None:
    """Materialize the corpus as a source-partitioned Parquet table.

    On a cluster this is the Iceberg table
    ``catalog.db.token_sequences PARTITIONED BY (source, days(ts))``; the
    sandbox has no Iceberg runtime jar, so we use the equivalent
    Hive-layout Parquet (partition pruning behaves identically).
    """
    token_sequences(spark, n_rows, **kw).write.mode("overwrite").partitionBy(
        "source"
    ).parquet(path)
