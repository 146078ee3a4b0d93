"""Train/eval decontamination — word-n-gram overlap against an eval set.

The standard LLM-corpus hygiene pass (GPT-3 appendix C / PaLM / Llama
style): a training document is contaminated if it shares at least
``min_overlap`` distinct word n-grams (n≈13 in the papers; configurable —
use smaller n for short documents) with any document of an evaluation
benchmark. The reference preprocessor has no eval-set notion; this is an
engine addition required by the LLM-pipeline mandate, same family as
functions/dedup.py.

Shape at scale (the whole point):
  * the EVAL side is small (benchmarks: 10^3-10^5 docs) — its distinct
    n-gram key set is aggregated first and broadcast, so the 10^12-doc
    train side joins without a shuffle (hash lookup per train n-gram);
  * the train side never materializes its n-gram set globally: n-grams
    explode per partition, hit the broadcast hash join, and only HITS
    survive to the (tiny) per-doc aggregation;
  * join keys are 8-byte ``xxhash64`` of the n-gram by default instead of
    the ~100-byte strings (``key="raw"`` keeps exact strings for oracle
    parity / collision-free audit; ``key="md5"`` is the 128-bit middle
    ground, mirrorable in DuckDB). At 10^9 distinct eval n-grams the
    64-bit collision expectation is ~0.03 spurious key equalities — and a
    collision can only ADD a candidate hit, never drop one, so
    ``min_overlap > 1`` is already collision-robust.

Documents shorter than ``n`` tokens produce no n-grams and are never
flagged (the papers fall back to smaller n for short eval docs; callers
can pass a smaller ``n`` for the same effect).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_ngrams",
    "token_ngram_keys",
    "doc_ngrams",
    "contamination",
    "contamination_tokens",
    "decontaminate",
]


def tokenize(text: Column | str) -> Column:
    """Whitespace word split, lowercased, empties dropped — the shared
    tokenization of this module. Materialize it ONCE per row (its own
    projection) before building n-grams: Spark does no common-subexpression
    elimination inside a projection, so an n-gram expression that embeds
    the regex split re-runs it per reference — and inside the window
    lambda, per WINDOW (measured 4.3 s → 1.3 s on the decontaminate
    benchmark query just from this split-once restructuring)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != F.lit(""))


def ngrams_from_tokens(toks: Column | str, n: int) -> Column:
    """Array of space-joined n-grams over an ALREADY-materialized token
    array column. Empty array below ``n`` tokens."""
    t = F.col(toks) if isinstance(toks, str) else toks
    # slice() is 1-based; sequence guard keeps it empty when size < n
    return F.when(F.size(t) >= n, F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: Column | str, n: int) -> Column:
    """Array of word n-grams (space-joined, lowercased) — native column
    expression, no UDF. Convenience one-expression form; the hot paths
    below project :func:`tokenize` into its own column first (see its
    docstring for why)."""
    return ngrams_from_tokens(tokenize(text), n)


def token_ngram_keys(tokens: Column | str, n: int) -> Column:
    """Array of 64-bit n-gram keys over a PRE-TOKENIZED sequence
    (``array<int>`` — the engine's authoritative payload): each window of
    ``n`` token ids hashes to one xxhash64 OF THE SLICE ARRAY itself.
    Token-id n-grams are the exact-match decontamination unit when the
    corpus is already tokenized — no detokenize/re-split round trip, and
    the window slides over ids, not whitespace. Empty array for sequences
    shorter than ``n``.

    Null elements key through a sentinel OUTSIDE the int32 token domain
    (-2^40 after a long cast): both concat_ws and xxhash64-over-arrays
    SKIP null elements, so windows with differently placed nulls — or
    whose non-null ids happen to agree — would collapse onto one key,
    producing spurious contamination hits. The array hash also skips
    materializing a string per window (the old concat_ws form)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    null_safe = F.transform(
        c, lambda x: F.coalesce(x.cast("long"), F.lit(-(1 << 40)))
    )
    return F.when(F.size(c) >= n, F.transform(
        F.sequence(F.lit(1), F.size(c) - F.lit(n - 1)),
        lambda i: F.xxhash64(F.slice(null_safe, i, n)),
    )).otherwise(F.array().cast("array<bigint>"))


def contamination_tokens(
    docs: DataFrame,
    eval_docs: DataFrame,
    tokens_col: str = "tokens",
    n: int = 13,
    id_col: str = "doc_id",
    eval_tokens_col: str | None = None,
    min_overlap: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """:func:`contamination` over token-id sequences instead of text —
    same broadcast-eval shape, same (id_col, n_hits) result."""
    ev = (
        eval_docs.select(
            F.explode(
                token_ngram_keys(eval_tokens_col or tokens_col, n)
            ).alias("__ng")
        )
        .distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    # per-doc distinct via array_distinct — no global (id, key) shuffle
    # (same rationale as doc_ngrams)
    train = docs.select(
        id_col,
        F.explode(
            F.array_distinct(token_ngram_keys(tokens_col, n))
        ).alias("__ng"),
    )
    return (
        train.join(ev, "__ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_overlap)
    )


def _keyed(g: Column, key: str) -> Column:
    if key == "raw":
        return g
    if key == "md5":
        return F.md5(g)
    if key == "xxhash64":
        return F.xxhash64(g)
    raise ValueError(f"unknown n-gram key codec: {key!r}")


def doc_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 13,
    id_col: str = "doc_id",
    key: str = "xxhash64",
) -> DataFrame:
    """(id, __ng) rows — each document's DISTINCT n-gram keys. Distinct is
    taken per document (repeated phrases inside one doc count once, per
    the papers' set semantics) — and WITHIN the row via array_distinct,
    never as a global DISTINCT: de-duplicating (id, key) pairs through a
    shuffle would move |corpus|×~|tokens| rows; the array form costs one
    local sort per doc and nothing crosses the wire."""
    return (
        df.select(id_col, tokenize(text_col).alias("__toks"))
        .select(
            id_col,
            F.explode(
                F.array_distinct(ngrams_from_tokens("__toks", n))
            ).alias("__g"),
        )
        .select(id_col, _keyed(F.col("__g"), key).alias("__ng"))
    )


def contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 13,
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    min_overlap: int = 1,
    key: str = "xxhash64",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per contaminated train doc: (id_col, n_hits) where n_hits counts the
    DISTINCT n-grams shared with the eval set (union over eval docs); only
    docs with n_hits ≥ min_overlap are returned."""
    ev = (
        eval_docs.select(tokenize(eval_text_col or text_col).alias("__toks"))
        .select(F.explode(ngrams_from_tokens("__toks", n)).alias("__g"))
        .select(_keyed(F.col("__g"), key).alias("__ng"))
        .distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    hits = doc_ngrams(docs, text_col, n, id_col, key).join(ev, "__ng")
    return (
        hits.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_overlap)
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 13,
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    min_overlap: int = 1,
    key: str = "xxhash64",
    broadcast_eval: bool = True,
) -> DataFrame:
    """The training corpus minus contaminated documents (left-anti join on
    the contamination set — payload columns never shuffle: only (id, hash)
    pairs move, the anti join keys on id).

    ``broadcast_eval`` governs only the (small) eval n-gram side inside
    :func:`contamination`. The contaminated-TRAIN-id set here scales with
    the train corpus — one boilerplate n-gram in the eval set can match
    10^8 train docs — so it is never force-broadcast; AQE broadcasts it at
    runtime when it turns out small."""
    bad = contamination(
        docs,
        eval_docs,
        text_col,
        n,
        id_col,
        eval_text_col,
        min_overlap,
        key,
        broadcast_eval,
    ).select(id_col)
    return docs.join(bad, id_col, "left_anti")
