"""Native array functions over the pre-tokenized payload column
``tokens: array<int32>`` — all JVM-side ArrayType expressions, no Python
(SURVEY §2.6: the target engine's token functions).

``token_fingerprint`` is the token-array-equality invariant hook
(BASELINE.json metric): two pipelines produce identical sequences iff the
xxhash64 fingerprints match — checked distributed, no array collection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_count(tokens: Column | str = "tokens") -> Column:
    """size(tokens) ≡ the n_tok column invariant."""
    return F.size(tokens)


def token_fingerprint(tokens: Column | str = "tokens") -> Column:
    """Order-sensitive 64-bit fingerprint of the exact token sequence."""
    return F.xxhash64(tokens)


def verify_n_tok(df: DataFrame) -> DataFrame:
    """Rows violating the n_tok == size(tokens) invariant (must be empty).
    Null-safe: a NULL n_tok (or NULL tokens) IS a violation — `!=` alone
    evaluates to NULL there and the corrupt row would escape the filter."""
    return df.filter(
        ~F.size("tokens").eqNullSafe(F.col("n_tok"))
    )


def token_stats(df: DataFrame, by: list[str] = ("source",)) -> DataFrame:
    """Per-group sequence statistics — one partial+final agg."""
    return df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.avg("n_tok").alias("avg_len"),
        F.min("n_tok").alias("min_len"),
        F.max("n_tok").alias("max_len"),
    )


def truncate_tokens(df: DataFrame, max_len: int, col: str = "tokens") -> DataFrame:
    """slice + recompute n_tok (context-window truncation)."""
    return df.withColumn(col, F.slice(F.col(col), 1, max_len)).withColumn(
        "n_tok", F.size(col).cast("int")
    )


def distinct_token_ratio(tokens: Column | str = "tokens") -> Column:
    """Lexical diversity of a sequence: |set(tokens)| / len(tokens)."""
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.size(F.array_distinct(t)) / F.size(t)


def pack_sequences(df: DataFrame, target_len: int) -> DataFrame:
    """Greedy sequence packing for training batches: assign docs to bins of
    ≈ target_len tokens per (source) using a running-sum bucket id — pure
    window arithmetic, then one groupBy concatenating token arrays with
    ``flatten(collect_list(tokens))`` ordered by doc_id.

    At scale, packing runs per (source, day) partition so no bin crosses a
    partition boundary (bins are an intra-partition concept)."""
    from pyspark.sql import Window

    # explicit ROWS frame: orderBy alone defaults to a RANGE frame, where
    # peer rows (duplicate doc_ids) all receive the sum INCLUDING every
    # peer — (cum - n_tok) then is not the doc's start offset and bins
    # silently over-fill
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tok").over(w)
    binned = df.withColumn("__bin", ((cum - F.col("n_tok")) / target_len).cast("long"))
    # collect_list order is nondeterministic → sort the collected structs by
    # doc_id before flattening so packed output is stable across runs
    packed = F.array_sort(F.collect_list(F.struct("doc_id", "tokens")))
    return (
        binned.groupBy("source", "__bin")
        .agg(
            F.flatten(F.transform(packed, lambda s: s["tokens"])).alias("tokens"),
            F.transform(packed, lambda s: s["doc_id"]).alias("doc_ids"),
            F.sum("n_tok").alias("n_tok_packed"),
        )
        .withColumnRenamed("__bin", "bin_id")
    )
