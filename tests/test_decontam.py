"""Decontamination operator (functions/decontam.py): n-gram extraction,
distinct-per-doc overlap counting, short-doc exemption, key-codec
equivalence, anti-join removal, and the broadcast plan shape the 10^12-doc
story depends on."""

import pytest
from pyspark.sql import functions as F

from preprocessor_spark.functions.decontam import (
    contamination,
    decontaminate,
    doc_ngrams,
    word_ngrams,
)

DOCS = [
    # 0: shares the 5-gram "a b c d e" with eval doc 100
    (0, "x y a b c d e z"),
    # 1: no overlap
    (1, "p q r s t u v w"),
    # 2: shares TWO distinct 5-grams with eval ("a b c d e", "b c d e f"),
    #    one of them repeated — distinct-per-doc must count 2, not 3
    (2, "a b c d e f a b c d e f"),
    # 3: too short for n=5 after split
    (3, "a b c d"),
    # 4: same tokens as eval doc but different order — no 5-gram overlap
    (4, "e d c b a f g h"),
]
EVAL = [(100, "a b c d e f g h")]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(EVAL, "doc_id long, text string")


def test_word_ngrams_expression(spark):
    df = spark.createDataFrame(
        [("The  quick brown fox",), ("one two",), (None,)], "t string"
    )
    got = [r[0] for r in df.select(word_ngrams("t", 3)).collect()]
    assert got[0] == ["the quick brown", "quick brown fox"]
    assert got[1] == []
    assert got[2] == []


def test_contamination_counts(spark, docs, ev):
    got = {
        r["doc_id"]: r["n_hits"]
        for r in contamination(docs, ev, n=5).collect()
    }
    assert got == {0: 1, 2: 2}


def test_key_codecs_agree(spark, docs, ev):
    base = None
    for key in ("raw", "md5", "xxhash64"):
        got = sorted(
            tuple(r) for r in contamination(docs, ev, n=5, key=key).collect()
        )
        if base is None:
            base = got
        assert got == base, f"key={key} diverged"


def test_decontaminate_removes_flagged(spark, docs, ev):
    kept = sorted(r["doc_id"] for r in decontaminate(docs, ev, n=5).collect())
    assert kept == [1, 3, 4]


def test_min_overlap_threshold(spark, docs, ev):
    got = sorted(
        r["doc_id"] for r in contamination(docs, ev, n=5, min_overlap=2).collect()
    )
    assert got == [2]


def test_doc_ngrams_distinct_per_doc(spark, docs):
    # doc 2's repeated phrase: 8 raw 5-grams but fewer distinct
    rows = doc_ngrams(docs.filter("doc_id = 2"), n=5, key="raw").collect()
    grams = [r["__ng"] for r in rows]
    assert len(grams) == len(set(grams))
    assert "a b c d e" in grams


def test_contamination_tokens(spark):
    """Token-id n-gram variant: windows slide over ids; a shared 3-window
    of ids flags the doc, a reordered/shorter one doesn't."""
    from preprocessor_spark.functions.decontam import (
        contamination_tokens,
        token_ngram_keys,
    )

    train = spark.createDataFrame(
        [
            (0, [9, 1, 2, 3, 8]),  # contains eval window (1,2,3)
            (1, [3, 2, 1, 4, 5]),  # reversed — no shared window
            (2, [1, 2]),  # too short for n=3
            (3, [1, 2, 3, 4, 5]),  # shares (1,2,3),(2,3,4),(3,4,5)
        ],
        "doc_id long, tokens array<int>",
    )
    ev = spark.createDataFrame(
        [(100, [1, 2, 3, 4, 5])], "doc_id long, tokens array<int>"
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_tokens(train, ev, n=3).collect()
    }
    assert got == {0: 1, 3: 3}
    # short sequence yields no keys at all
    short = spark.createDataFrame([([1, 2],)], "tokens array<int>")
    assert short.select(token_ngram_keys("tokens", 3)).collect()[0][0] == []


def test_eval_side_broadcasts(spark, docs, ev):
    """The train side must meet the eval n-gram set in a broadcast hash
    join — a shuffled join over 10^12 exploded train n-grams is the
    failure mode this operator exists to avoid."""
    plan = (
        contamination(docs, ev, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # exactly two shuffles, NEITHER on the exploded train n-grams: the
    # per-doc hit count (keyed on doc_id, hits only) and the eval set's
    # cross-doc distinct inside the broadcast build (≤|eval n-grams| rows).
    # Train-side per-doc distinct is array-local, so the corpus-sized
    # exploded stream flows scan → explode → hash-probe with no exchange.
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("Exchange hashpartitioning(doc_id") == 1, plan
