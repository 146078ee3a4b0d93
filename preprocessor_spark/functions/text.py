"""Text analysis for training-data pipelines — language-ID heuristic,
quality scoring, token counting, document fingerprinting. All native column
expressions (JVM/codegen); deterministic so results are reproducible at any
parallelism.

These extend the reference's text-column statistics (SURVEY §2.4 A9,
app/core/data_handler.py:438-447) into the document-pipeline operations the
north-star engine needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic —
# deterministic and cheap; real deployments swap in fasttext via mapInPandas
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "que", "por"],
}

# BPE-ish token regex: word pieces, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text: Column | str = "text") -> Column:
    """Whitespace tokenization of lowercased text. Empty tokens are
    dropped: a raw split of text with LEADING whitespace (or of the empty
    string) yields a '' first token, silently skewing token counts and
    making word-set/shingle dedup keys differ between ' foo bar' and
    'foo bar' — the simhash/decontamination oracles already filtered it;
    this makes the engine side agree everywhere."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != F.lit(""))


def whitespace_token_count(text: Column | str = "text") -> Column:
    return F.size(words(text))


def regex_token_count(text: Column | str = "text") -> Column:
    """BPE-ish token count: words, numbers and symbols counted separately."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0))


def stopword_hits(text: Column | str, lang: str) -> Column:
    return F.size(
        F.array_intersect(
            words(text), F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        )
    )


def detect_language(text: Column | str = "text") -> Column:
    """Stopword-overlap language ID: argmax over per-language hit counts,
    'und' (undetermined) when no stopword matches."""
    scored = F.array(
        *[
            F.struct(stopword_hits(text, lang).alias("hits"), F.lit(lang).alias("lang"))
            for lang in STOPWORDS
        ]
    )
    best = F.array_max(scored)  # struct compare: hits first, then lang
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def punct_ratio(text: Column | str = "text") -> Column:
    t = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(t), F.lit(1))


def stopword_occurrences(text: Column | str, lang: str) -> Column:
    """Total stopword OCCURRENCES (with multiplicity) — the quality-ratio
    numerator. The distinct-overlap count (:func:`stopword_hits`) caps at
    |stoplist| = 10, so distinct/total inverts into a length penalty: every
    clean document past ~200 words scores stopword_ratio < 0.05 no matter
    how English it is."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words(text), lambda x: F.array_contains(sw, x)))


def stopword_ratio(text: Column | str = "text", lang: str = "en") -> Column:
    return stopword_occurrences(text, lang) / F.greatest(
        whitespace_token_count(text), F.lit(1)
    )


def quality_score(text: Column | str = "text") -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    English stopword presence + mean word length band. Deterministic
    arithmetic only; weights sum to 1."""
    t = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(t)
    n_words = whitespace_token_count(t)
    mean_wlen = n_chars / F.greatest(n_words, F.lit(1))
    len_ok = (
        F.when((n_chars >= 20) & (n_chars <= 20000), 1.0)
        .when(n_chars >= 5, 0.5)
        .otherwise(0.0)
    )
    punct_ok = F.when(punct_ratio(t) <= 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(t) >= 0.05, 1.0).otherwise(0.0)
    wlen_ok = F.when((mean_wlen >= 2.5) & (mean_wlen <= 12.0), 1.0).otherwise(0.0)
    return (
        0.3 * len_ok + 0.2 * punct_ok + 0.3 * stop_ok + 0.2 * wlen_ok
    ).cast("double")


def doc_fingerprint(text: Column | str = "text") -> Column:
    """Order-sensitive 64-bit document fingerprint (content-defined identity
    for exact dedup and lineage): xxhash64 of the full text."""
    t = F.col(text) if isinstance(text, str) else text
    return F.xxhash64(t)


def rolling_fingerprints(text: Column | str = "text", k: int = 8) -> Column:
    """Rolling k-word shingle fingerprints (the near-dup signature input):
    array of xxhash64 over each k-word window — native transform over a
    positions sequence, no Python."""
    ws = words(text)
    n = F.size(ws)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.xxhash64(F.slice(ws, i, k)))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full per-document analysis column set."""
    return (
        df.withColumn("lang_detected", detect_language(text_col))
        .withColumn("n_words", whitespace_token_count(text_col))
        .withColumn("n_tokens_regex", regex_token_count(text_col))
        .withColumn("punct_ratio", punct_ratio(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("fingerprint", doc_fingerprint(text_col))
    )
