"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2 /
the north rule; ``oracle_sql()`` carries the DuckDB-equivalent ANSI SQL run
side-by-side at sf=0.01. Column aliases match exactly on both sides; float
columns are rounded identically on both sides so order-insensitive value
hashes agree despite summation-order differences.

Every queries() entry has an oracle_sql() twin. The hash-based operators
(minhash, simhash, LSH ANN) derive their hash families from md5 arithmetic
(functions/hashing.py) so DuckDB reproduces the exact signatures, candidate
sets and verified pairs; the codec round-trip is checked through its
lossless invariant (decoded tier == directly-aggregated tier); EMA uses a
truncated power-weighted window (weights beyond β^700 ≈ 1e-32 are far below
the rounding quantum); FFT peaks are checked against a naive DFT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship: hourly continuous-aggregate rollup of the events stream with the
# full tier chain (1h from raw, 1d re-aggregated from 1h), SURVEY §2.4/§2.5
# --------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    return q_rollup_1h(spark, SF_DEFAULT)


# ------------------------------------------------------------ rollup tiers
def q_rollup_1h(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(
            "event_type",
            F.date_trunc("hour", "ts").alias("bucket_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("value"), 4).alias("sum_v"),
            F.round(F.min("value"), 6).alias("min_v"),
            F.round(F.max("value"), 6).alias("max_v"),
            F.round(F.avg("value"), 6).alias("mean_v"),
        )
    )


def q_rollup_1d_from_1h(spark: SparkSession, sf: str) -> DataFrame:
    """Tier chain: the 1d tier re-aggregates the 1h tier's algebraic stats
    (never the raw facts) — the continuous-aggregate invariant."""
    ev = _t(spark, sf, "events")
    t1h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return (
        t1h.groupBy("event_type", F.date_trunc("day", "h").alias("bucket_start"))
        .agg(
            F.sum("n").alias("n_points"),
            F.round(F.sum("s"), 4).alias("sum_v"),
            F.round(F.min("mn"), 6).alias("min_v"),
            F.round(F.max("mx"), 6).alias("max_v"),
        )
    )


def q_rollup_gapfill_1h(spark: SparkSession, sf: str) -> DataFrame:
    """Dense hourly spine per event_type, LEFT JOIN the 1h tier, zero-filled
    counts (SURVEY §2.3 J1 / W3 gap-fill)."""
    ev = _t(spark, sf, "events")
    t1h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = t1h.groupBy("event_type").agg(
        F.min("bucket_start").alias("t0"), F.max("bucket_start").alias("t1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket_start"),
    )
    return spine.join(t1h, ["event_type", "bucket_start"], "left").select(
        "event_type",
        "bucket_start",
        F.coalesce("n", F.lit(0)).alias("n_points"),
    )


def q_rollup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental continuous-aggregate refresh
    (preprocessor_spark/rollup/incremental.py): the corpus is split at a
    time cutoff into a base and an appended delta, each aggregated to 1h
    algebraic partials INDEPENDENTLY, then merged with
    :func:`merge_partials` — the oracle aggregates the whole table in one
    pass, so a hash match proves merge(base, delta) == full recompute (the
    identity every O(delta) tier refresh rests on)."""
    from preprocessor_spark.rollup.incremental import merge_partials
    from preprocessor_spark.rollup.tiers import RollupTree, TierSpec

    ev = _t(spark, sf, "events").select("event_type", "ts", "value")
    tree = RollupTree(
        time_col="ts",
        series_cols=["event_type"],
        value_col="value",
        tiers=[TierSpec("1h", "1 hour")],
    )
    cut = "2024-01-23 00:00:00"
    base = tree.base_aggregate(ev.filter(F.col("ts") < cut), tree.tiers[0])
    delta = tree.base_aggregate(ev.filter(F.col("ts") >= cut), tree.tiers[0])
    merged = merge_partials(base, delta, ["event_type", "bucket_start"])
    return merged.select(
        "event_type",
        "bucket_start",
        "n_points",
        F.round("sum_v", 4).alias("sum_v"),
        F.round("sum_sq", 4).alias("sum_sq"),
        F.round("min_v", 6).alias("min_v"),
        F.round("max_v", 6).alias("max_v"),
    )


def q_tier_hist_1h(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable per-tier histogram (rollup/tiers.py::histogram_agg): 10
    fixed bins over value∈[0,50) per (event_type, hour), emitted long-form
    (bin, n) with empty bins dropped — the tier statistic behind
    percentile queries at every retention level; re-aggregation and
    incremental-merge folds are pinned by tests/test_tier_histogram.py."""
    from preprocessor_spark.rollup.tiers import histogram_agg

    ev = _t(spark, sf, "events")
    t1h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_start")
    ).agg(histogram_agg(F.col("value"), 0.0, 50.0, 10))
    return (
        t1h.select(
            "event_type",
            "bucket_start",
            F.posexplode("hist_v").alias("bin", "n"),
        )
        .filter(F.col("n") > 0)
        .select("event_type", "bucket_start", F.col("bin").cast("long").alias("bin"), "n")
    )


def q_retention_tiers(spark: SparkSession, sf: str) -> DataFrame:
    """Retention-policy enforcement over the tier tree: fine tier keeps 7
    days, coarse tier 30 days (relative to the corpus max ts); per tier the
    surviving bucket count, earliest surviving bucket, and point mass.
    The predicate is pure bucket_start arithmetic — partition-prunable."""
    from preprocessor_spark.rollup.tiers import (
        RetentionPolicy,
        RollupTree,
        TierSpec,
    )

    ev = _t(spark, sf, "events").select("event_type", "ts", "value")
    tree = RollupTree(
        time_col="ts",
        series_cols=["event_type"],
        value_col="value",
        tiers=[TierSpec("1h", "1 hour"), TierSpec("1d", "1 day")],
    )
    t1h = tree.base_aggregate(ev, tree.tiers[0])
    t1d = tree.reaggregate(t1h, tree.tiers[1])
    now_s = ev.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
    pol = RetentionPolicy({"1h": "7 days", "1d": "30 days"})
    parts = [
        pol.enforce(df, name, now_s).agg(
            F.lit(name).alias("tier"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.min("bucket_start").alias("min_bucket"),
            F.sum("n_points").cast("bigint").alias("points"),
        )
        for name, df in (("1h", t1h), ("1d", t1d))
    ]
    return parts[0].unionByName(parts[1])


def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user session count with 30-minute inactivity gaps — lag + running
    sum (streaming-style sessionization as batch window algebra)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    gap = F.when(epoch - F.lag(epoch).over(w) > 1800, 1).otherwise(0)
    sess = ev.withColumn("new_s", gap).withColumn(
        "session_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id").agg(
        (F.max("session_id") + 1).alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------- normalize / unbias ops
def q_zscore_value(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event_type z-score (sample std, zero-variance→1.0 — reference
    A2/M1 semantics) of events.value."""
    ev = _t(spark, sf, "events")
    stats = ev.groupBy("event_type").agg(
        F.mean("value").alias("mu"),
        F.coalesce(
            F.when(F.stddev_samp("value") == 0.0, 1.0).otherwise(
                F.stddev_samp("value")
            ),
            F.lit(1.0),
        ).alias("sigma"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6).alias(
                "v_norm"
            ),
        )
    )


def q_minmax_value(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event_type min-max with the default-plugin +1e-8 epsilon (M2)."""
    ev = _t(spark, sf, "events")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round(
                (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo") + 1e-8),
                6,
            ).alias("v_norm"),
        )
    )


def q_ma_unbias(spark: SparkSession, sf: str) -> DataFrame:
    """W1 moving-average residual: trailing 5-row window incl. current row,
    partial head windows, per event_type ordered by (ts, event_id)."""
    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") - F.avg("value").over(w), 6).alias("v_unbiased"),
    )


def q_outlier_filter(spark: SparkSession, sf: str) -> DataFrame:
    """P6 outlier row filter: keep |v − mean| ≤ 3·std per event_type."""
    ev = _t(spark, sf, "events")
    stats = ev.groupBy("event_type").agg(
        F.mean("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(F.col("value") - F.col("mu")) <= 3.0 * F.col("sigma"))
        .select("event_id", "event_type", F.round("value", 6).alias("value"))
    )


def q_autocorr(spark: SparkSession, sf: str) -> DataFrame:
    """W12 autocorrelation screen: corr(v, lag_k(v)) for k=1..3 per
    event_type."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_type",
        "value",
        *[F.lag("value", k).over(w).alias(f"l{k}") for k in (1, 2, 3)],
    )
    return lagged.groupBy("event_type").agg(
        *[F.round(F.corr("value", f"l{k}"), 6).alias(f"ac{k}") for k in (1, 2, 3)]
    )


def q_split_six_way(spark: SparkSession, sf: str) -> DataFrame:
    """W6 exact-count six-way temporal split (reference remainder rule) —
    per-split counts and time boundaries (W7), via the scale path: the
    exact-quantile boundary fit (no global row_number shuffle) + pure
    predicate labels. Equivalence with the positional transform is
    pytest-verified (tests/test_splitter.py)."""
    from preprocessor_spark.operators.splitter import TemporalSplitter

    ev = _t(spark, sf, "events")
    sp = TemporalSplitter(time_col="ts", tiebreak_cols=["event_id"])
    boundaries = sp.fit_time_boundaries(ev).params["boundaries"]
    labeled = TemporalSplitter.split_by_time_boundaries(ev, "ts", boundaries)
    return labeled.groupBy("split_id").agg(
        F.count(F.lit(1)).alias("sample_count"),
        F.min("ts").alias("start_time"),
        F.max("ts").alias("end_time"),
    )


def q_trim_time_range(spark: SparkSession, sf: str) -> DataFrame:
    """P3 scale-path row trim: drop a time range (partition-prunable
    predicate), count the remainder per event_type."""
    from preprocessor_spark.operators.trimmer import Trimmer

    ev = _t(spark, sf, "events")
    trimmed = Trimmer.drop_time_range(
        ev, "ts", "2024-01-10 00:00:00", "2024-01-15 00:00:00"
    )
    return trimmed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("value"), 4).alias("sum_v"),
    )


def q_split_shuffle_counts(spark: SparkSession, sf: str) -> DataFrame:
    """W8 shuffled split: membership is a hash-stable permutation (engine-
    specific), but the PER-SPLIT COUNTS follow the exact remainder rule —
    the oracle-checkable surface."""
    from preprocessor_spark.operators.splitter import TemporalSplitter

    ev = _t(spark, sf, "events")
    labeled = TemporalSplitter(
        time_col="ts", tiebreak_cols=["event_id"], shuffle=True, seed=7
    ).transform(ev)
    return labeled.groupBy("split_id").agg(
        F.count(F.lit(1)).alias("sample_count")
    )


def q_split_stratified_counts(spark: SparkSession, sf: str) -> DataFrame:
    """W9 stratified split: per-(stratum, split) counts follow the W6
    remainder rule applied to each stratum's total."""
    from preprocessor_spark.operators.splitter import TemporalSplitter

    ev = _t(spark, sf, "events")
    out = TemporalSplitter(time_col="ts", seed=7).stratified(ev, "event_type")
    return out.groupBy("event_type", "split_id").agg(
        F.count(F.lit(1)).alias("sample_count")
    )


def q_denormalize_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """M3 inverse transform: z-score fit → transform → inverse must
    reproduce the original values (round-6 surface)."""
    from preprocessor_spark.operators.normalizer import Normalizer

    ev = _t(spark, sf, "events").select("event_id", "value")
    norm = Normalizer(method="zscore", columns=["value"])
    params = norm.fit(ev)
    back = norm.inverse_transform(norm.transform(ev, params), params)
    return back.select("event_id", F.round("value", 6).alias("value"))


def q_lag_diff(spark: SparkSession, sf: str) -> DataFrame:
    """W11 lag-1 difference per event_type ordered by (ts, event_id)."""
    from preprocessor_spark.functions.analysis import lag_diff

    ev = _t(spark, sf, "events")
    out = lag_diff(
        ev, "value", time_col="ts", series_cols=["event_type"],
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "event_id", "event_type", F.round("value_diff", 6).alias("d1")
    )


# --------------------------------------------------------------- documents
def q_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token-sequence stats per source over whitespace-tokenized documents
    (the (doc_id, tokens, n_tok, source) model derived in-query)."""
    d = _t(spark, sf, "documents")
    toks = d.select(
        "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    return toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_tok"), 6).alias("avg_len"),
        F.min("n_tok").alias("min_len"),
        F.max("n_tok").alias("max_len"),
    )


def q_token_hist(spark: SparkSession, sf: str) -> DataFrame:
    """Token-length histogram in buckets of 16 (corpus length profile)."""
    d = _t(spark, sf, "documents")
    b = (F.size(F.split("text", " ")) / 16).cast("bigint").alias("len_bucket")
    return d.groupBy(b).agg(F.count(F.lit(1)).alias("n_docs"))


def q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Train/eval decontamination (functions/decontam.py): docs sharing a
    13-word n-gram (the GPT-3 appendix-C window) with the deterministic
    eval slice (doc_id % 7 == 0) are flagged with their distinct-overlap
    count. ``key="raw"`` joins on the n-gram strings themselves so the
    DuckDB mirror is exact; the scale default is 8-byte xxhash64 keys
    (hash-equivalence pinned by tests/test_decontam.py)."""
    from preprocessor_spark.functions.decontam import contamination

    d = _t(spark, sf, "documents")
    ev = d.filter(F.col("doc_id") % 7 == 0)
    train = d.filter(F.col("doc_id") % 7 != 0)
    return contamination(train, ev, text_col="text", n=13, key="raw").select(
        "doc_id", "n_hits"
    )


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: lowest doc_id per identical text (SURVEY training-data
    dedup, exact tier).

    ORACLE SURFACE ONLY: grouping by the full text payload keeps the SQL
    mirror trivial, but it shuffles document bodies. The production path
    is ``functions/dedup.py:exact_dedup`` (hash-keyed — payloads never
    shuffle); benchmark THAT shape, not this one."""
    d = _t(spark, sf, "documents")
    return d.groupBy("text").agg(F.min("doc_id").alias("keep_id")).select(
        "keep_id"
    )


def q_dedup_word_set(spark: SparkSession, sf: str) -> DataFrame:
    """Word-set (Jaccard == 1) dedup: lowest doc_id per identical sorted
    distinct word set."""
    d = _t(spark, sf, "documents")
    key = F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
    return (
        d.select(key.alias("wordset"), "doc_id")
        .groupBy("wordset")
        .agg(F.min("doc_id").alias("keep_id"))
        .select("keep_id")
    )


def q_duplicate_stats(spark: SparkSession, sf: str) -> DataFrame:
    """A6 duplicate accounting over the corpus."""
    d = _t(spark, sf, "documents")
    per = d.groupBy("text").agg(F.count(F.lit(1)).alias("copies"))
    return per.agg(
        F.count(F.lit(1)).alias("distinct_texts"),
        F.sum("copies").cast("bigint").alias("total_docs"),
        F.sum(F.col("copies") - 1).cast("bigint").alias("duplicate_docs"),
    )


def q_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document text analysis: chars, whitespace tokens, BPE-ish regex
    tokens, punctuation ratio."""
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(F.split("text", " ")).alias("n_words"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
            )
        ).alias("n_tokens_regex"),
        F.round(
            (
                F.length("text")
                - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
            )
            / F.greatest(F.length("text"), F.lit(1)),
            6,
        ).alias("punct_ratio"),
    )


def q_stopword_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-hit language-ID features per document (distinct-word
    intersection with tiny per-language lists)."""
    from preprocessor_spark.functions.text import STOPWORDS

    d = _t(spark, sf, "documents")
    ws = F.array_distinct(F.split(F.lower("text"), " "))
    cols = [
        F.size(
            F.array_intersect(ws, F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
        ).alias(f"hits_{lang}")
        for lang in ("en", "de", "fr", "es")
    ]
    return d.select("doc_id", *cols)


def q_doc_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Composite quality score buckets (documents kept per quality band)."""
    from preprocessor_spark.functions.text import quality_score

    d = _t(spark, sf, "documents")
    return (
        d.select(F.round(quality_score("text"), 6).alias("quality"))
        .groupBy("quality")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# -------------------------------------------------------------- embeddings
def q_similarity_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 to the vec_id=0 embedding (exact ANN
    baseline).

    The 1-row query vector is collected driver-side (the standard
    fit/transform-style tiny collect) and inlined as scalar literals:
    scoring is then a SINGLE scan with an unrolled codegen dot —
    TakeOrderedAndProject, no join. The earlier broadcast-crossJoin shape
    put the interpreted HOF cosine inside the join's generated consume
    method, which blew janino's 64 KB limit and silently dropped the whole
    stage to interpreted execution (observed in the driver sweep)."""
    import math

    from preprocessor_spark.functions.similarity import (
        _py_fold_dot,
        dot_query_inline,
        norm_inline,
    )

    e = _t(spark, sf, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select("embedding").head()
    if qrow is None or qrow[0] is None:
        # no (or null) query vector: an empty top-k, not a driver TypeError
        return e.select(
            "vec_id", F.lit(0.0).alias("cos_sim")
        ).limit(0)
    q = [float(x) for x in qrow[0]]
    # ||q|| precomputed with the same left-fold order as the Spark/oracle
    # expressions (IEEE-754 ops are deterministic given order), so
    # dot/(norm_e * lit(norm_q)) is bit-identical to the joined form
    qn = math.sqrt(_py_fold_dot(q, q))
    cos = dot_query_inline("embedding", q) / (
        norm_inline("embedding", len(q)) * F.lit(qn)
    )
    return (
        e.select("vec_id", F.round(cos, 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


def q_embedding_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine near-dup pairs among vec_id < 1000 at threshold 0.4 —
    tuned to return ~59 pairs at sf0.01 so the oracle actually exercises
    the cosine/pair logic (round-2 VERDICT: the old 0.5/vec_id<300 window
    returned 0 rows on both sides — vacuous). This is the explicitly-capped
    exact O(n²) baseline; the LSH-bucketed variant is the scale path.

    Round-3 VERDICT measured this query at 16.9 s — 32% of the whole
    49-query bench — with the per-pair interpreted-HOF cosine evaluated
    inside the BroadcastNestedLoopJoin CONDITION (Catalyst substitutes the
    filter through the projection and pushes it into the join, where it
    runs on the interpreted Predicate path, single-task). Three fixes,
    same rounded surface:
      * each side's L2 norm is computed once per row BELOW the join, so
        the per-pair expression is a single unrolled codegen dot product
        (same products, same summation order as similarity.dot_inline);
      * each side's embedding is cast to array<double> ONCE below the
        join, so the per-pair dot is 64 bare get()*get() terms with no
        per-term CAST (float→double widening commutes with get — values
        bit-identical). Measured 2.1x faster at sf0.1 (8.9 → 4.2 s), and
        it keeps the fused join+generate+project consume method under
        janino's 64 KB limit — the per-term CAST variant was observed
        falling back to interpreted execution in the 50-query sweep;
      * the cosine is emitted through explode(array(...)) — a Generate
        node, which predicate pushdown cannot cross, keeping the join
        condition at the cheap `id_a < id_b` and the heavy arithmetic in
        a codegen'd operator above it;
      * the stream side is repartitioned so the pair loop parallelizes
        instead of running as one task."""
    from preprocessor_spark.functions.similarity import norm_inline

    e = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 1000)
    dim = 64  # embeddings table dim (TESTDATA.md); static per corpus
    l = e.repartition(32).select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").cast("array<double>").alias("ea"),
        norm_inline("embedding", dim).alias("na"),
    )
    r = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").cast("array<double>").alias("eb"),
        norm_inline("embedding", dim).alias("nb"),
    )
    dot = F.expr(
        " + ".join(f"(get(ea, {i}) * get(eb, {i}))" for i in range(dim))
    )
    cos = F.round(dot / (F.col("na") * F.col("nb")), 4)
    return (
        l.join(r, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.explode(F.array(cos)).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.4)
    )


def q_embedding_neardups(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-table hyperplane-LSH near-dup pairs (functions/dedup.py:
    embedding_near_dups, 4 tables × 8 planes, md5-derived hyperplanes) —
    the SCALE path whose exact-O(n²) twin is `embedding_pairs`. The
    operator's internal verify threshold is set a hair BELOW the graded
    one (0.399 < 0.4) and the graded filter applies to the ROUNDED cosine
    on both sides, so a boundary pair can't flip on sub-ulp
    Spark-vs-DuckDB summation differences."""
    from preprocessor_spark.functions.dedup import embedding_near_dups

    e = _t(spark, sf, "embeddings")
    pairs = embedding_near_dups(
        e,
        emb_col="embedding",
        id_col="vec_id",
        threshold=0.399,
        num_planes=8,
        seed=42,
        dim=64,  # embeddings table dim (TESTDATA.md); static per corpus
        num_tables=4,
    )
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 4).alias("cos_sim")
    ).filter(F.col("cos_sim") >= 0.4)


def q_embedding_norms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding count + mean L2 norm (array aggregate check)."""
    from preprocessor_spark.functions.similarity import norm

    e = _t(spark, sf, "embeddings")
    return (
        e.select("label", norm(F.col("embedding").cast("array<double>")).alias("n2"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("n2"), 6).alias("avg_norm"),
        )
    )


# ----------------------------------------------------------- TPC-H breadth
def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (relational agg breadth check)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_revenue_by_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Join breadth check: lineitem ⋈ orders, revenue per order priority.
    The orders side is the smaller input — joined shuffle-side with AQE;
    at warehouse scale this is the canonical broadcast-dim pattern."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-way join breadth: fact ⋈ orders, then the customer→nation→
    region dim chain joined as BROADCAST hash joins (the canonical
    star-schema pattern: the fact side never shuffles for the dims)."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_rollup_grouping(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical grouping-sets summary (ROLLUP event_type → day):
    per-(type, day), per-type subtotals and the grand total in one
    aggregate — the OLAP sub/grand-total shape over the events stream."""
    ev = _t(spark, sf, "events")
    return (
        ev.rollup("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("value"), 4).alias("sum_v"),
        )
        .select("event_type", "day", "n_points", "sum_v")
    )


def q_top_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Top-10 customers by revenue (join + agg + top-k)."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        rev.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


# ----------------------------------------------------- metadata / quality
def q_null_completeness(spark: SparkSession, sf: str) -> DataFrame:
    """A5 null counts + completeness % over events."""
    from preprocessor_spark.operators.metadata import null_report

    return null_report(_t(spark, sf, "events"))


def q_dup_row_stats(spark: SparkSession, sf: str) -> DataFrame:
    """A6 whole-row duplicate stats over documents rows."""
    from preprocessor_spark.operators.metadata import duplicate_row_stats

    return duplicate_row_stats(_t(spark, sf, "documents").select("text", "source"))


def q_describe_stats(spark: SparkSession, sf: str) -> DataFrame:
    """A7 describe(): count/mean/std/min/quartiles/max, long format."""
    from preprocessor_spark.operators.metadata import describe_stats

    out = describe_stats(
        _t(spark, sf, "lineitem"), ["l_quantity", "l_discount"]
    )
    return out.select("column", "stat", F.round("value", 6).alias("value"))


def q_iqr_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """A8 IQR outlier counts (1.5·IQR beyond Q1/Q3)."""
    from preprocessor_spark.operators.metadata import iqr_outlier_counts

    return iqr_outlier_counts(_t(spark, sf, "events"), ["value"])


def q_text_colstats(spark: SparkSession, sf: str) -> DataFrame:
    """A9 text-column stats (distinct count, avg length) for documents."""
    d = _t(spark, sf, "documents")
    return d.agg(
        F.countDistinct("source").alias("n_unique_source"),
        F.round(F.avg(F.length("text")), 6).alias("avg_text_length"),
        F.countDistinct("lang").alias("n_unique_lang"),
    )


def q_mode_stats(spark: SparkSession, sf: str) -> DataFrame:
    """A9 text-column stats in long format including the DETERMINISTIC mode
    (smallest value on frequency ties — engine-stable, so DuckDB mirrors it
    with ORDER BY count DESC, value ASC LIMIT 1)."""
    from preprocessor_spark.operators.metadata import text_column_stats

    return text_column_stats(_t(spark, sf, "documents"), ["source", "lang"])


def q_snr(spark: SparkSession, sf: str) -> DataFrame:
    """M8 SNR + Shannon-Hartley capacity per event_type."""
    from preprocessor_spark.functions.analysis import snr_stats

    return snr_stats(_t(spark, sf, "events"), "value", by=["event_type"])


def q_pipeline_zscore_by_split(spark: SparkSession, sf: str) -> DataFrame:
    """EP1 Stage B+C parity end-to-end: six-way temporal split → z-score fit
    on d1+d2 ONLY → transform all → per-split mean/std of the normalized
    column (A11 validation surface). The oracle reproduces the whole chain
    in SQL including the exact remainder rule."""
    from preprocessor_spark.operators.normalizer import Normalizer
    from preprocessor_spark.operators.splitter import TemporalSplitter

    ev = _t(spark, sf, "events").select("event_id", "ts", "value")
    labeled = TemporalSplitter(
        time_col="ts", tiebreak_cols=["event_id"]
    ).transform(ev)
    norm = Normalizer(method="zscore", columns=["value"])
    params = norm.fit(labeled.filter(F.col("split_id").isin("d1", "d2")))
    normed = norm.transform(labeled, params)
    return normed.groupBy("split_id").agg(
        F.round(F.mean("value"), 6).alias("mean_norm"),
        F.round(F.stddev_samp("value"), 6).alias("std_norm"),
        F.count(F.lit(1)).alias("n"),
    )


# ------------------------------------- window-algebra / hash-mirror queries
def q_interpolate_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-fill the hourly mean series per event_type and linearly
    interpolate missing buckets (W3). Oracle: the identical row-positional
    window algebra (IGNORE NULLS last/first_value) in DuckDB; exact pandas
    oracle additionally in tests/test_cleaner.py."""
    from preprocessor_spark.operators.cleaner import interpolate_linear

    t1h = (
        _t(spark, sf, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_start"))
        .agg(F.avg("value").alias("mean_v"))
    )
    bounds = t1h.groupBy("event_type").agg(
        F.min("bucket_start").alias("t0"), F.max("bucket_start").alias("t1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias(
            "bucket_start"
        ),
    )
    filled = spine.join(t1h, ["event_type", "bucket_start"], "left")
    out = interpolate_linear(filled, ["mean_v"], "bucket_start", ["event_type"])
    return out.select(
        "event_type", "bucket_start", F.round("mean_v", 6).alias("mean_v")
    )


def q_ema_unbias(spark: SparkSession, sf: str) -> DataFrame:
    """W2 EMA residual via pandas ewm inside applyInPandas. Oracle: the
    adjust=True EMA is a ratio of power-weighted sums; DuckDB evaluates it
    over a 700-row trailing list window (truncation error ~1e-32, far
    below the round-4 quantum; the two algorithms differ in summation
    order, hence round 4 not 6). Bit-exact pandas oracle additionally in
    tests/test_unbiaser.py."""
    from preprocessor_spark.operators.unbiaser import Unbiaser

    ev = _t(spark, sf, "events").select("event_id", "ts", "event_type", "value")
    u = Unbiaser(
        method="ema",
        ema_alpha=0.1,
        series_cols=["event_type"],
        value_cols=["value"],
        tiebreak_cols=["event_id"],
    )
    return u.transform(ev).select(
        "event_id", "event_type", F.round("value", 4).alias("v_unbiased")
    )


def q_minhash_neardups(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup pairs. md5-derived signatures (one digest per
    shingle + per-permutation affine transforms) are engine-portable, so
    the DuckDB oracle reproduces the exact candidate set and verified
    Jaccard; known-duplicate corpus oracle additionally in
    tests/test_dedup.py."""
    from preprocessor_spark.functions.dedup import minhash_lsh_pairs

    d = _t(spark, sf, "documents")
    return minhash_lsh_pairs(
        d, jaccard_threshold=0.5, shingle_mode="word", shingle_k=3
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_simhash_neardups(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash hamming≤3 near-dup pairs — 60-bit md5-derived signatures,
    bit-for-bit mirrored by the DuckDB oracle."""
    from preprocessor_spark.functions.dedup import simhash_near_dups

    return simhash_near_dups(_t(spark, sf, "documents"), max_hamming=3)


def q_tier_compression_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Gorilla/delta-of-delta block encode→decode of the 1h tier. Oracle:
    the lossless invariant — decoded totals must equal the
    directly-aggregated tier totals (bit-exact round-trip oracle
    additionally in tests/test_compression_blocks.py)."""
    from preprocessor_spark.rollup.compression import (
        decode_tier_blocks,
        encode_tier_blocks,
    )

    ev = _t(spark, sf, "events")
    tier = ev.groupBy(
        F.col("event_type").alias("source"),
        F.date_trunc("hour", "ts").alias("bucket_start"),
    ).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("value").alias("sum_v"),
        F.sum(F.col("value") * F.col("value")).alias("sum_sq"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    blocks = encode_tier_blocks(tier, ["source"], block_buckets=256)
    decoded = decode_tier_blocks(blocks, ["source"])
    return decoded.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.round(F.sum("sum_v"), 4).alias("sum_v_total"),
    )


def q_mutual_info(spark: SparkSession, sf: str) -> DataFrame:
    """F3 distributed binned MI: rank lineitem features against
    extendedprice. Oracle: the same quantile-binned joint-histogram MI in
    DuckDB (bin id = #edges strictly below x); synthetic-oracle pytest in
    tests/test_metadata_analysis.py."""
    from preprocessor_spark.functions.analysis import mutual_information

    li = _t(spark, sf, "lineitem")
    return mutual_information(
        li,
        ["l_quantity", "l_discount", "l_tax"],
        "l_extendedprice",
        bins=8,
        # exact edges bit-match DuckDB's quantile_cont; the engine default
        # is the approx_percentile sketch (the 10^12-row shape), verified
        # by the rank-equivalence pytest instead of a value hash
        edge_method="exact",
    )


def q_fft_peaks(spark: SparkSession, sf: str) -> DataFrame:
    """W13 FFT top-5 spectral peaks of the hourly event-count series.
    Oracle: naive DFT (sum of cos/sin terms) in DuckDB — same spectrum as
    numpy's rfft to ~1e-11 dB, well inside the round-4 quantum. peak_rank
    is dropped from the comparison surface so a sub-ulp magnitude tie can
    never flip rank labels between engines (the compare is set-based)."""
    from preprocessor_spark.functions.analysis import fft_top_peaks

    t1h = (
        _t(spark, sf, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_start"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    peaks = fft_top_peaks(
        t1h, "n", time_col="bucket_start", series_cols=["event_type"], top_k=5
    )
    return peaks.select(
        "event_type", "freq_index", F.round("magnitude_db", 4).alias("magnitude_db")
    )


def q_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed ANN top-10 (scale path). md5-derived hyperplanes make
    the bucket assignment reproducible in DuckDB; ordering is on the
    ROUNDED cosine (+ vec_id tiebreak) so the ranking is engine-stable.
    Exact-recall oracle additionally in tests/test_similarity.py."""
    from preprocessor_spark.functions.similarity import lsh_topk

    e = _t(spark, sf, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select("embedding").head()
    if qrow is None or qrow[0] is None:
        # no (or null) query vector: an empty top-k, not a driver
        # IndexError/TypeError (same guard as q_similarity_topk)
        return e.select("vec_id", F.lit(0.0).alias("cos_sim")).limit(0)
    return lsh_topk(e, list(qrow[0]), k=10, num_planes=6, round_digits=4)


def q_multimodal_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end multimodal pipeline with a pure-arithmetic oracle
    (reference has no media path — engine addition; VERDICT r2 item 3).

    Every synthesis parameter of the media table derives from hex
    substrings of md5(doc_id) (multimodal.synth_media_sql), so DuckDB can
    recompute — WITHOUT decoding a byte — what the Spark side must observe
    after running the REAL pipeline over REAL encoded payloads:

      * payload_bytes   — exact encoded size (verifies the BMP/WAV/frame
        encoders write the spec'd byte layout: headers, 4-byte row padding,
        PCM sample width, per-frame concatenation);
      * dec_w/dec_h     — round(features[0..1]·4096): real decode must read
        the dimensions back out of the encoded headers;
      * content_level   — image/video: round(mean-channel feature·255) = the
        constant fill value; audio: round(rms feature·32768) = |amplitude|.
        Exact by construction (constant fill ⇒ every float op is exact, see
        test_multimodal_oracle_arithmetic), so the oracle checks DECODED
        CONTENT, not just plumbing;
      * n_samples_dec   — audio duration feature inverted to the sample
        count;
      * target_width/height — aspect-preserving resize boxes at max_side=32
        (image + video rows);
      * n_frames_plan / n_frames_real — frame count from the native
        sequence/explode plan vs. frames actually decoded by walking the
        container's bfSize seek table;
      * resized_bytes   — byte size of the re-encoded payload after the
        REAL nearest-neighbor resize (decode → resize → encode round-trip).

    500 rows at sf0.01 — each stage is mapInPandas over Arrow batches; at
    scale the media table would be persisted once and partitioned by
    modality (multimodal.py module docstring) instead of re-derived per
    stage as this small oracle query does."""
    from preprocessor_spark.functions.multimodal import (
        extract_features,
        extract_sampled_frames,
        resize_images,
        sample_frames,
        synth_media_sql,
    )

    docs = _t(spark, sf, "documents").select("doc_id")
    media = synth_media_sql(docs)
    is_audio = F.col("modality") == "audio"

    feats = extract_features(media, decode_backend="real").select(
        "media_id",
        F.when(
            ~is_audio, F.round(F.element_at("features", 1) * 4096).cast("int")
        ).alias("dec_w"),
        F.when(
            ~is_audio, F.round(F.element_at("features", 2) * 4096).cast("int")
        ).alias("dec_h"),
        F.when(is_audio, F.round(F.element_at("features", 2) * 32768))
        .otherwise(F.round(F.element_at("features", 3) * 255))
        .cast("int")
        .alias("content_level"),
        F.when(
            is_audio,
            F.round(F.element_at("features", 1) * 60 * 8000).cast("int"),
        ).alias("n_samples_dec"),
    )
    meta = resize_images(media, max_side=32, backend="metadata").select(
        "media_id",
        "modality",
        F.length("payload").cast("int").alias("payload_bytes"),
        "target_width",
        "target_height",
    )
    frames_plan = (
        sample_frames(media, every_ms=1000)
        .groupBy("media_id")
        .agg(F.count("frame_ms").cast("int").alias("n_frames_plan"))
    )
    frames_real = (
        extract_sampled_frames(media.filter(F.col("modality") == "video"))
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_frames_real"))
    )
    resized = (
        resize_images(
            media.filter(F.col("modality") == "image"), max_side=32,
            backend="real",
        )
        .select("media_id", F.length("payload").cast("int").alias("resized_bytes"))
    )
    return (
        meta.join(feats, "media_id")
        .join(frames_plan, "media_id")
        .join(frames_real, "media_id", "left")
        .join(resized, "media_id", "left")
        .select(
            "media_id", "modality", "payload_bytes", "dec_w", "dec_h",
            "content_level", "n_samples_dec", "target_width", "target_height",
            "n_frames_plan",
            F.coalesce("n_frames_real", F.lit(0)).cast("int").alias(
                "n_frames_real"
            ),
            "resized_bytes",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # rollup / downsample / retention tree
        "rollup_1h": q_rollup_1h,
        "rollup_1d_from_1h": q_rollup_1d_from_1h,
        "rollup_gapfill_1h": q_rollup_gapfill_1h,
        "rollup_incremental": q_rollup_incremental,
        "tier_hist_1h": q_tier_hist_1h,
        "retention_tiers": q_retention_tiers,
        "sessionize": q_sessionize,
        # preprocessing operators (reference parity)
        "zscore_value": q_zscore_value,
        "minmax_value": q_minmax_value,
        "ma_unbias": q_ma_unbias,
        "outlier_filter": q_outlier_filter,
        "autocorr": q_autocorr,
        "split_six_way": q_split_six_way,
        "split_shuffle_counts": q_split_shuffle_counts,
        "split_stratified_counts": q_split_stratified_counts,
        "denormalize_roundtrip": q_denormalize_roundtrip,
        "lag_diff": q_lag_diff,
        "trim_time_range": q_trim_time_range,
        # documents / training-data pipeline
        "token_stats": q_token_stats,
        "token_hist": q_token_hist,
        "decontaminate": q_decontaminate,
        "dedup_exact": q_dedup_exact,
        "dedup_word_set": q_dedup_word_set,
        "duplicate_stats": q_duplicate_stats,
        "text_stats": q_text_stats,
        "stopword_langid": q_stopword_langid,
        "doc_quality": q_doc_quality,
        # embeddings / similarity
        "similarity_topk": q_similarity_topk,
        "embedding_pairs": q_embedding_pairs,
        "embedding_neardups": q_embedding_neardups,
        "embedding_norms": q_embedding_norms,
        # metadata / quality / diagnostics
        "null_completeness": q_null_completeness,
        "dup_row_stats": q_dup_row_stats,
        "describe_stats": q_describe_stats,
        "iqr_outliers": q_iqr_outliers,
        "text_colstats": q_text_colstats,
        "mode_stats": q_mode_stats,
        "snr": q_snr,
        "pipeline_zscore_by_split": q_pipeline_zscore_by_split,
        # relational breadth
        "pricing_summary": q_pricing_summary,
        "revenue_by_priority": q_revenue_by_priority,
        "region_revenue": q_region_revenue,
        "rollup_grouping": q_rollup_grouping,
        "top_customers": q_top_customers,
        # window-algebra / hash-mirror / derived-invariant oracles
        "interpolate_hourly": q_interpolate_hourly,
        "ema_unbias": q_ema_unbias,
        "minhash_neardups": q_minhash_neardups,
        "simhash_neardups": q_simhash_neardups,
        "tier_compression_roundtrip": q_tier_compression_roundtrip,
        "mutual_info": q_mutual_info,
        "fft_peaks": q_fft_peaks,
        "lsh_topk": q_lsh_topk,
        # multimodal (engine addition; md5-parameterized arithmetic oracle)
        "multimodal_pipeline": q_multimodal_pipeline,
    }


def _minhash_oracle_sql() -> str:
    """DuckDB mirror of functions/dedup.py:minhash_lsh_pairs (word mode,
    k=3, 64 hashes, 16 bands, threshold 0.5): identical md5-derived
    signatures (per-permutation affine transforms over the single shingle
    digest, constants from hashing.perm_coeffs — themselves md5-derived,
    so a third engine can re-derive them from the seed), identical band
    keys, identical candidates, true-Jaccard verification over the same
    distinct 60-bit shingle hashes."""
    from preprocessor_spark.functions.hashing import MERSENNE31, perm_coeffs

    m31 = MERSENNE31
    num_hashes, bands, rpb = 64, 16, 4
    mins = ",\n             ".join(
        f"min(({perm_coeffs(i)[0]}*(h1 % {m31}) + {perm_coeffs(i)[1]})"
        f" % {m31}) AS g{i}"
        for i in range(num_hashes)
    )
    band_keys = ",\n               ".join(
        "(" + " || ',' || ".join(
            f"CAST(g{b * rpb + r} AS VARCHAR)" for r in range(rpb)
        ) + ")"
        for b in range(bands)
    )
    return f"""
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(w) - 2, 1) + 1),
                   j -> array_to_string(w[j:j+2], ' ')))) AS s
          FROM (SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS w
                FROM documents)
        ), h AS (
          SELECT doc_id,
                 ('0x' || substr(md5(s), 1, 15))::BIGINT AS h1
          FROM sh
        ), sig AS (
          SELECT doc_id,
             {mins},
             list(DISTINCT h1) AS shs
          FROM h GROUP BY doc_id
        ), bandrows AS (
          SELECT doc_id, t.i AS band, keys[t.i + 1] AS bh
          FROM (SELECT doc_id,
               [{band_keys}] AS keys
                FROM sig) CROSS JOIN range({bands}) t(i)
        ), cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM bandrows l JOIN bandrows r
            ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
        ), verified AS (
          SELECT c.id_a, c.id_b,
                 len(list_intersect(a.shs, b.shs))
                   / (len(a.shs) + len(b.shs)
                      - len(list_intersect(a.shs, b.shs))) AS j
          FROM cand c
          JOIN sig a ON c.id_a = a.doc_id
          JOIN sig b ON c.id_b = b.doc_id
        )
        SELECT id_a, id_b, round(j, 6) AS jaccard
        FROM verified WHERE j >= 0.5
    """


def _simhash_oracle_sql() -> str:
    """DuckDB mirror of functions/dedup.py:simhash_near_dups: 60-bit
    md5-derived SimHash, 4x15-bit pigeonhole blocking, hamming <= 3."""
    return """
        WITH w AS (
          SELECT doc_id,
                 unnest(string_split_regex(lower(text), '\\s+')) AS word
          FROM documents
        ), h AS (
          SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h
          FROM w WHERE length(word) > 0
        ), votes AS (
          SELECT doc_id, t.i AS i,
                 sum(CASE WHEN (h >> t.i) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM h CROSS JOIN range(60) t(i)
          GROUP BY 1, 2
        ), sig0 AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END)
                      AS BIGINT) AS sh
          FROM votes GROUP BY 1
        ), sig AS (
          SELECT d.doc_id, COALESCE(s.sh, 0) AS sh
          FROM documents d LEFT JOIN sig0 s ON d.doc_id = s.doc_id
        ), chunks AS (
          SELECT doc_id, sh, t.i AS ci, (sh >> (15 * t.i)) & 32767 AS cv
          FROM sig CROSS JOIN range(4) t(i)
        ), cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                          l.sh AS sa, r.sh AS sb
          FROM chunks l JOIN chunks r
            ON l.ci = r.ci AND l.cv = r.cv AND l.doc_id < r.doc_id
        )
        SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """


def _lsh_topk_oracle_sql() -> str:
    """DuckDB mirror of functions/similarity.py:lsh_topk (6 planes, seed 42,
    k=10): identical md5-derived hyperplanes and bucket bits, rounded-cosine
    ordering."""
    return """
        WITH vecs AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ), planes AS (
          SELECT p.p, d.d,
                 ('0x' || substr(md5('plane:42:' || p.p || ':' || d.d), 1, 15))::BIGINT
                   / 576460752303423488.0 - 1.0 AS w
          FROM range(6) p(p) CROSS JOIN range(64) d(d)
        ), dots AS (
          SELECT v.vec_id, pl.p, sum(v.e[pl.d + 1] * pl.w) AS dp
          FROM vecs v CROSS JOIN planes pl
          GROUP BY 1, 2
        ), sigs AS (
          SELECT vec_id,
                 CAST(sum(CASE WHEN dp > 0 THEN (1::BIGINT << p) ELSE 0 END)
                      AS BIGINT) AS b
          FROM dots GROUP BY 1
        ), qv AS (SELECT e FROM vecs WHERE vec_id = 0),
        qb AS (SELECT b FROM sigs WHERE vec_id = 0)
        SELECT v.vec_id,
               round(list_dot_product(v.e, qv.e)
                 / (sqrt(list_dot_product(v.e, v.e))
                    * sqrt(list_dot_product(qv.e, qv.e))), 4) AS cosine
        FROM vecs v
        JOIN sigs s ON v.vec_id = s.vec_id
        CROSS JOIN qv CROSS JOIN qb
        WHERE s.b = qb.b
        ORDER BY cosine DESC, v.vec_id
        LIMIT 10
    """


def _embedding_neardups_oracle_sql() -> str:
    """DuckDB mirror of functions/dedup.py:embedding_near_dups (4 tables ×
    8 planes, dim 64): table t's hyperplanes use seed 42 + 1000003·t, a
    pair is a candidate when ANY table's 8-bit signature matches, verified
    by exact cosine; graded filter on the ROUNDED cosine (see
    q_embedding_neardups for the boundary rationale)."""
    return """
        WITH vecs AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ), planes AS (
          SELECT t.t, p.p, d.d,
                 ('0x' || substr(md5('plane:' || (42 + 1000003 * t.t) || ':'
                                     || p.p || ':' || d.d), 1, 15))::BIGINT
                   / 576460752303423488.0 - 1.0 AS w
          FROM range(4) t(t) CROSS JOIN range(8) p(p) CROSS JOIN range(64) d(d)
        ), dots AS (
          SELECT v.vec_id, pl.t, pl.p, sum(v.e[pl.d + 1] * pl.w) AS dp
          FROM vecs v CROSS JOIN planes pl
          GROUP BY 1, 2, 3
        ), sigs AS (
          SELECT vec_id, t,
                 CAST(sum(CASE WHEN dp > 0 THEN (1::BIGINT << p) ELSE 0 END)
                      AS BIGINT) AS b
          FROM dots GROUP BY 1, 2
        ), cand AS (
          SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
          FROM sigs l
          JOIN sigs r ON l.t = r.t AND l.b = r.b AND l.vec_id < r.vec_id
        )
        SELECT id_a, id_b, cos_sim FROM (
          SELECT c.id_a, c.id_b,
                 round(list_dot_product(a.e, b.e)
                   / (sqrt(list_dot_product(a.e, a.e))
                      * sqrt(list_dot_product(b.e, b.e))), 4) AS cos_sim
          FROM cand c
          JOIN vecs a ON a.vec_id = c.id_a
          JOIN vecs b ON b.vec_id = c.id_b
        ) WHERE cos_sim >= 0.4
    """


def _mutual_info_oracle_sql() -> str:
    """DuckDB mirror of functions/analysis.py:mutual_information over
    lineitem (features l_quantity/l_discount/l_tax vs l_extendedprice,
    8 quantile bins): bin id = #edges strictly below x (identical to the
    Spark CASE ladder), MI from the joint histogram."""
    probs = "[" + ", ".join(str(i / 8) for i in range(1, 8)) + "]"
    per_feature = []
    for feat in ("l_quantity", "l_discount", "l_tax"):
        per_feature.append(f"""
          SELECT '{feat}' AS feature, round(sum(term), 6) AS mi_bits FROM (
            SELECT (n / total) * log2(n * total / (px * py)) AS term FROM (
              SELECT count(*)::DOUBLE AS n,
                     sum(count(*)) OVER ()::DOUBLE AS total,
                     sum(count(*)) OVER (PARTITION BY xb)::DOUBLE AS px,
                     sum(count(*)) OVER (PARTITION BY yb)::DOUBLE AS py
              FROM (
                SELECT len(list_filter(e.ex_{feat}, v -> v < l.{feat})) AS xb,
                       len(list_filter(e.ey, v -> v < l.l_extendedprice)) AS yb
                FROM lineitem l CROSS JOIN edges e
                WHERE l.{feat} IS NOT NULL
                  AND l.l_extendedprice IS NOT NULL
              ) GROUP BY xb, yb
            )
          )""")
    union = "\n          UNION ALL".join(per_feature)
    return f"""
        WITH edges AS (
          SELECT quantile_cont(l_quantity, {probs}) AS ex_l_quantity,
                 quantile_cont(l_discount, {probs}) AS ex_l_discount,
                 quantile_cont(l_tax, {probs}) AS ex_l_tax,
                 quantile_cont(l_extendedprice, {probs}) AS ey
          FROM lineitem
        )
        {union}
    """


def _fft_peaks_oracle_sql() -> str:
    """DuckDB mirror of functions/analysis.py:fft_top_peaks over the hourly
    event-count series: naive DFT per (event_type, freq), top-5 by
    (db DESC, freq ASC)."""
    return """
        WITH t1h AS (
          SELECT event_type, date_trunc('hour', ts) AS b,
                 count(*)::DOUBLE AS n
          FROM events GROUP BY 1, 2
        ), series AS (
          SELECT event_type,
                 n - avg(n) OVER (PARTITION BY event_type) AS x,
                 row_number() OVER (PARTITION BY event_type ORDER BY b) - 1 AS p,
                 count(*) OVER (PARTITION BY event_type) AS len
          FROM t1h
        ), freqs AS (
          SELECT event_type, len, unnest(range(1, len // 2 + 1)) AS k
          FROM (SELECT DISTINCT event_type, len FROM series)
        ), terms AS (
          SELECT f.event_type, f.k,
                 sum(s.x * cos(2 * pi() * f.k * s.p / f.len)) AS re,
                 sum(s.x * sin(2 * pi() * f.k * s.p / f.len)) AS im
          FROM freqs f JOIN series s USING (event_type)
          GROUP BY 1, 2
        ), mags AS (
          SELECT event_type, k,
                 20 * log10(greatest(sqrt(re * re + im * im), 1e-12)) AS db
          FROM terms
        ), ranked AS (
          SELECT event_type, k, db,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY db DESC, k) AS rk
          FROM mags
        )
        SELECT event_type, CAST(k AS INT) AS freq_index,
               round(db, 4) AS magnitude_db
        FROM ranked WHERE rk <= 5
    """


def oracle_sql() -> dict[str, str]:
    stop = {
        "en": "['the','and','of','to','in','is','that','it','was','for']",
        "de": "['der','die','das','und','ist','von','mit','den','nicht','ein']",
        "fr": "['le','la','les','de','et','est','un','une','que','pour']",
        "es": "['el','la','los','de','y','es','un','una','que','por']",
    }
    return {
        "rollup_1h": """
            SELECT event_type,
                   date_trunc('hour', ts) AS bucket_start,
                   count(*) AS n_points,
                   round(sum(value), 4) AS sum_v,
                   round(min(value), 6) AS min_v,
                   round(max(value), 6) AS max_v,
                   round(avg(value), 6) AS mean_v
            FROM events GROUP BY 1, 2
        """,
        "rollup_1d_from_1h": """
            WITH t1h AS (
              SELECT event_type, date_trunc('hour', ts) AS h,
                     count(*) AS n, sum(value) AS s,
                     min(value) AS mn, max(value) AS mx
              FROM events GROUP BY 1, 2
            )
            SELECT event_type, date_trunc('day', h) AS bucket_start,
                   CAST(sum(n) AS BIGINT) AS n_points,
                   round(sum(s), 4) AS sum_v,
                   round(min(mn), 6) AS min_v,
                   round(max(mx), 6) AS max_v
            FROM t1h GROUP BY 1, 2
        """,
        "tier_hist_1h": """
            SELECT event_type,
                   date_trunc('hour', ts) AS bucket_start,
                   CAST(least(greatest(floor(value / 5.0), 0), 9) AS BIGINT) AS bin,
                   count(*) AS n
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2, 3
        """,
        "rollup_incremental": """
            SELECT event_type,
                   date_trunc('hour', ts) AS bucket_start,
                   count(value) AS n_points,
                   round(sum(value), 4) AS sum_v,
                   round(sum(value * value), 4) AS sum_sq,
                   round(min(value), 6) AS min_v,
                   round(max(value), 6) AS max_v
            FROM events GROUP BY 1, 2
        """,
        "rollup_gapfill_1h": """
            WITH t1h AS (
              SELECT event_type, date_trunc('hour', ts) AS bucket_start,
                     count(*) AS n
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT event_type, min(bucket_start) AS t0, max(bucket_start) AS t1
              FROM t1h GROUP BY 1
            ), spine AS (
              SELECT b.event_type,
                     unnest(generate_series(b.t0, b.t1, INTERVAL 1 HOUR))
                       AS bucket_start
              FROM bounds b
            )
            SELECT s.event_type, s.bucket_start,
                   COALESCE(t.n, 0) AS n_points
            FROM spine s LEFT JOIN t1h t
              ON s.event_type = t.event_type AND s.bucket_start = t.bucket_start
        """,
        "retention_tiers": """
            WITH now_t AS (SELECT epoch(max(ts)) AS now_s FROM events),
            t1h AS (
              SELECT event_type, date_trunc('hour', ts) AS b, count(*) AS n
              FROM events GROUP BY 1, 2
            ), t1d AS (
              SELECT event_type, date_trunc('day', b) AS b, sum(n) AS n
              FROM t1h GROUP BY 1, 2
            )
            SELECT '1h' AS tier, count(*) AS n_buckets,
                   min(b) AS min_bucket, CAST(sum(n) AS BIGINT) AS points
            FROM t1h, now_t WHERE epoch(b) >= now_s - 7 * 86400
            UNION ALL
            SELECT '1d', count(*), min(b), CAST(sum(n) AS BIGINT)
            FROM t1d, now_t WHERE epoch(b) >= now_s - 30 * 86400
        """,
        "sessionize": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
              FROM g
            )
            SELECT user_id,
                   CAST(max(session_id) + 1 AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM s GROUP BY 1
        """,
        "zscore_value": """
            WITH stats AS (
              SELECT event_type, avg(value) AS mu,
                     CASE WHEN COALESCE(stddev_samp(value), 0) = 0 THEN 1.0
                          ELSE stddev_samp(value) END AS sigma
              FROM events GROUP BY 1
            )
            SELECT e.event_id, e.event_type,
                   round((e.value - s.mu) / s.sigma, 6) AS v_norm
            FROM events e JOIN stats s USING (event_type)
        """,
        "minmax_value": """
            WITH stats AS (
              SELECT event_type, min(value) AS lo, max(value) AS hi
              FROM events GROUP BY 1
            )
            SELECT e.event_id, e.event_type,
                   round((e.value - s.lo) / (s.hi - s.lo + 1e-8), 6) AS v_norm
            FROM events e JOIN stats s USING (event_type)
        """,
        "ma_unbias": """
            SELECT event_id, event_type,
                   round(value - avg(value) OVER (
                     PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
                   AS v_unbiased
            FROM events
        """,
        "outlier_filter": """
            WITH stats AS (
              SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
              FROM events GROUP BY 1
            )
            SELECT e.event_id, e.event_type, round(e.value, 6) AS value
            FROM events e JOIN stats s USING (event_type)
            WHERE abs(e.value - s.mu) <= 3.0 * s.sigma
        """,
        "autocorr": """
            WITH lagged AS (
              SELECT event_type, value,
                     lag(value, 1) OVER w AS l1,
                     lag(value, 2) OVER w AS l2,
                     lag(value, 3) OVER w AS l3
              FROM events
              WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
            )
            SELECT event_type,
                   round(corr(value, l1), 6) AS ac1,
                   round(corr(value, l2), 6) AS ac2,
                   round(corr(value, l3), 6) AS ac3
            FROM lagged GROUP BY 1
        """,
        "split_six_way": """
            WITH ordered AS (
              SELECT ts, row_number() OVER (ORDER BY ts, event_id) - 1 AS pos
              FROM events
            ), n AS (SELECT count(*) AS total FROM events),
            base AS (
              SELECT total,
                     CAST(floor(total * 0.5) AS BIGINT) AS c1,
                     CAST(floor(total * 0.1) AS BIGINT) AS c2
              FROM n
            ), alloc AS (
              -- remainder round-robin over ratio-descending keys d1,d2..d6
              SELECT total, c1, c2, total - (c1 + 5 * c2) AS rem FROM base
            ), counts AS (
              SELECT c1 + CASE WHEN rem > 0 THEN 1 ELSE 0 END AS k1,
                     c2 + CASE WHEN rem > 1 THEN 1 ELSE 0 END AS k2,
                     c2 + CASE WHEN rem > 2 THEN 1 ELSE 0 END AS k3,
                     c2 + CASE WHEN rem > 3 THEN 1 ELSE 0 END AS k4,
                     c2 + CASE WHEN rem > 4 THEN 1 ELSE 0 END AS k5,
                     c2 AS k6
              FROM alloc
            ), labeled AS (
              SELECT o.ts,
                     CASE
                       WHEN o.pos < c.k1 THEN 'd1'
                       WHEN o.pos < c.k1 + c.k2 THEN 'd2'
                       WHEN o.pos < c.k1 + c.k2 + c.k3 THEN 'd3'
                       WHEN o.pos < c.k1 + c.k2 + c.k3 + c.k4 THEN 'd4'
                       WHEN o.pos < c.k1 + c.k2 + c.k3 + c.k4 + c.k5 THEN 'd5'
                       ELSE 'd6'
                     END AS split_id
              FROM ordered o CROSS JOIN counts c
            )
            SELECT split_id, count(*) AS sample_count,
                   min(ts) AS start_time, max(ts) AS end_time
            FROM labeled GROUP BY 1
        """,
        "split_shuffle_counts": """
            WITH n AS (SELECT count(*) AS total FROM events),
            base AS (
              SELECT total,
                     CAST(floor(total * 0.5) AS BIGINT) AS c1,
                     CAST(floor(total * 0.1) AS BIGINT) AS c2
              FROM n
            ), alloc AS (
              SELECT total, c1, c2, total - (c1 + 5 * c2) AS rem FROM base
            )
            SELECT 'd1' AS split_id,
                   c1 + CASE WHEN rem > 0 THEN 1 ELSE 0 END AS sample_count
            FROM alloc
            UNION ALL SELECT 'd2', c2 + CASE WHEN rem > 1 THEN 1 ELSE 0 END FROM alloc
            UNION ALL SELECT 'd3', c2 + CASE WHEN rem > 2 THEN 1 ELSE 0 END FROM alloc
            UNION ALL SELECT 'd4', c2 + CASE WHEN rem > 3 THEN 1 ELSE 0 END FROM alloc
            UNION ALL SELECT 'd5', c2 + CASE WHEN rem > 4 THEN 1 ELSE 0 END FROM alloc
            UNION ALL SELECT 'd6', c2 FROM alloc
        """,
        "split_stratified_counts": """
            WITH tot AS (
              SELECT event_type, count(*) AS total FROM events GROUP BY 1
            ), base AS (
              SELECT event_type, total,
                     CAST(floor(total * 0.5) AS BIGINT) AS c1,
                     CAST(floor(total * 0.1) AS BIGINT) AS c2
              FROM tot
            ), alloc AS (
              SELECT event_type, total, c1, c2,
                     total - (c1 + 5 * c2) AS rem
              FROM base
            ), expanded AS (
              SELECT event_type, 'd1' AS split_id,
                     c1 + CASE WHEN rem > 0 THEN 1 ELSE 0 END AS sample_count
              FROM alloc
              UNION ALL SELECT event_type, 'd2', c2 + CASE WHEN rem > 1 THEN 1 ELSE 0 END FROM alloc
              UNION ALL SELECT event_type, 'd3', c2 + CASE WHEN rem > 2 THEN 1 ELSE 0 END FROM alloc
              UNION ALL SELECT event_type, 'd4', c2 + CASE WHEN rem > 3 THEN 1 ELSE 0 END FROM alloc
              UNION ALL SELECT event_type, 'd5', c2 + CASE WHEN rem > 4 THEN 1 ELSE 0 END FROM alloc
              UNION ALL SELECT event_type, 'd6', c2 FROM alloc
            )
            SELECT event_type, split_id, sample_count
            FROM expanded WHERE sample_count > 0
        """,
        "denormalize_roundtrip": """
            SELECT event_id, round(value, 6) AS value FROM events
        """,
        "lag_diff": """
            SELECT event_id, event_type,
                   round(value - lag(value, 1) OVER (
                     PARTITION BY event_type ORDER BY ts, event_id), 6) AS d1
            FROM events
        """,
        "trim_time_range": """
            SELECT event_type, count(*) AS n_rows,
                   round(sum(value), 4) AS sum_v
            FROM events
            WHERE NOT (ts >= TIMESTAMP '2024-01-10 00:00:00'
                       AND ts < TIMESTAMP '2024-01-15 00:00:00')
            GROUP BY 1
        """,
        "token_stats": """
            WITH toks AS (
              SELECT source, len(string_split(text, ' ')) AS n_tok
              FROM documents
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS total_tokens,
                   round(avg(n_tok), 6) AS avg_len,
                   CAST(min(n_tok) AS INT) AS min_len,
                   CAST(max(n_tok) AS INT) AS max_len
            FROM toks GROUP BY 1
        """,
        "token_hist": """
            SELECT CAST(floor(len(string_split(text, ' ')) / 16) AS BIGINT)
                     AS len_bucket,
                   count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "decontaminate": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ), ng AS (
              SELECT doc_id, array_to_string(t[i:i+12], ' ') AS g
              FROM toks, UNNEST(range(1, len(t) - 11)) AS r(i)
              WHERE len(t) >= 13
            ), ngd AS (SELECT DISTINCT doc_id, g FROM ng),
            ev AS (SELECT DISTINCT g FROM ngd WHERE doc_id % 7 = 0)
            SELECT d.doc_id, count(*) AS n_hits
            FROM (SELECT * FROM ngd WHERE doc_id % 7 <> 0) d
            JOIN ev USING (g)
            GROUP BY 1
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS keep_id FROM documents GROUP BY text
        """,
        "dedup_word_set": """
            SELECT min(doc_id) AS keep_id
            FROM documents
            GROUP BY array_to_string(
                       list_sort(list_distinct(string_split(text, ' '))), ' ')
        """,
        "duplicate_stats": """
            WITH per AS (
              SELECT text, count(*) AS copies FROM documents GROUP BY 1
            )
            SELECT count(*) AS distinct_texts,
                   CAST(sum(copies) AS BIGINT) AS total_docs,
                   CAST(sum(copies - 1) AS BIGINT) AS duplicate_docs
            FROM per
        """,
        "text_stats": """
            SELECT doc_id,
                   CAST(length(text) AS INT) AS n_chars,
                   CAST(len(string_split(text, ' ')) AS INT) AS n_words,
                   CAST(len(regexp_extract_all(
                     text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT)
                     AS n_tokens_regex,
                   round(
                     (length(text) - length(regexp_replace(
                        text, '[^\\w\\s]', '', 'g')))
                     / greatest(length(text), 1), 6) AS punct_ratio
            FROM documents
        """,
        "stopword_langid": f"""
            SELECT doc_id,
                   CAST(len(list_intersect(ws, {stop['en']})) AS INT) AS hits_en,
                   CAST(len(list_intersect(ws, {stop['de']})) AS INT) AS hits_de,
                   CAST(len(list_intersect(ws, {stop['fr']})) AS INT) AS hits_fr,
                   CAST(len(list_intersect(ws, {stop['es']})) AS INT) AS hits_es
            FROM (SELECT doc_id,
                         list_distinct(string_split(lower(text), ' ')) AS ws
                  FROM documents)
        """,
        "doc_quality": """
            -- word counts mirror functions/text.words(): split on \\s+ and
            -- DROP empty tokens, so padded text (' foo  bar') scores the
            -- same as 'foo bar' on both sides
            WITH w AS (
              SELECT text,
                     len(list_filter(string_split_regex(lower(text), '\\s+'),
                                     x -> x <> '')) AS n_words,
                     len(list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> list_contains(
                         ['the','and','of','to','in','is','that','it','was',
                          'for'], x))) AS n_stop
              FROM documents
            ), q AS (
              SELECT round(
                0.3 * (CASE WHEN length(text) BETWEEN 20 AND 20000 THEN 1.0
                            WHEN length(text) >= 5 THEN 0.5 ELSE 0.0 END)
              + 0.2 * (CASE WHEN
                  (length(text) - length(regexp_replace(text,'[^\\w\\s]','','g')))
                  / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.0 END)
              + 0.3 * (CASE WHEN n_stop / greatest(n_words, 1) >= 0.05
                  THEN 1.0 ELSE 0.0 END)
              + 0.2 * (CASE WHEN
                  length(text) / greatest(n_words, 1)
                  BETWEEN 2.5 AND 12.0 THEN 1.0 ELSE 0.0 END), 6) AS quality
              FROM w
            )
            SELECT quality, count(*) AS n_docs FROM q GROUP BY 1
        """,
        "similarity_topk": """
            WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_dot_product(
                           CAST(e.embedding AS DOUBLE[]),
                           CAST(q.q_emb AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(q.q_emb AS DOUBLE[]),
                                                CAST(q.q_emb AS DOUBLE[])))), 4)
                   AS cos_sim
            FROM embeddings e CROSS JOIN q
            ORDER BY cos_sim DESC, e.vec_id
            LIMIT 10
        """,
        "embedding_pairs": """
            WITH sub AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
              FROM embeddings WHERE vec_id < 1000
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.emb, b.emb)
                     / (sqrt(list_dot_product(a.emb, a.emb))
                        * sqrt(list_dot_product(b.emb, b.emb))), 4) AS cos_sim
            FROM sub a JOIN sub b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.emb, b.emb)
                  / (sqrt(list_dot_product(a.emb, a.emb))
                     * sqrt(list_dot_product(b.emb, b.emb))), 4) >= 0.4
        """,
        "embedding_norms": """
            SELECT label, count(*) AS n_vecs,
                   round(avg(sqrt(list_dot_product(
                     CAST(embedding AS DOUBLE[]),
                     CAST(embedding AS DOUBLE[])))), 6) AS avg_norm
            FROM embeddings GROUP BY 1
        """,
        "null_completeness": """
            SELECT count(*) AS n_rows,
                   CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_event_id,
                   CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_ts,
                   CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_user_id,
                   CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_event_type,
                   CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_value,
                   CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_props,
                   round((1 - (
                     sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
                   + sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)
                   + sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                   + sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
                   + sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                   + sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
                   ) * 1.0 / greatest(count(*) * 6, 1)) * 100, 6)
                     AS completeness_pct
            FROM events
        """,
        "dup_row_stats": """
            WITH per AS (
              SELECT text, source, count(*) AS copies
              FROM documents GROUP BY 1, 2
            )
            SELECT CAST(sum(copies) AS BIGINT) AS n_rows,
                   CAST(sum(copies - 1) AS BIGINT) AS duplicate_rows,
                   round(sum(copies - 1) * 100.0 / sum(copies), 6)
                     AS duplicate_pct
            FROM per
        """,
        "describe_stats": """
            WITH s AS (
              SELECT
                count(l_quantity)::DOUBLE AS "l_quantity||count",
                avg(l_quantity) AS "l_quantity||mean",
                stddev_samp(l_quantity) AS "l_quantity||std",
                min(l_quantity)::DOUBLE AS "l_quantity||min",
                quantile_cont(l_quantity, 0.25) AS "l_quantity||q1",
                quantile_cont(l_quantity, 0.5) AS "l_quantity||median",
                quantile_cont(l_quantity, 0.75) AS "l_quantity||q3",
                max(l_quantity)::DOUBLE AS "l_quantity||max",
                count(l_discount)::DOUBLE AS "l_discount||count",
                avg(l_discount) AS "l_discount||mean",
                stddev_samp(l_discount) AS "l_discount||std",
                min(l_discount)::DOUBLE AS "l_discount||min",
                quantile_cont(l_discount, 0.25) AS "l_discount||q1",
                quantile_cont(l_discount, 0.5) AS "l_discount||median",
                quantile_cont(l_discount, 0.75) AS "l_discount||q3",
                max(l_discount)::DOUBLE AS "l_discount||max"
              FROM lineitem
            )
            SELECT 'l_quantity' AS column, 'count' AS stat, round("l_quantity||count", 6) AS value FROM s
            UNION ALL SELECT 'l_quantity', 'mean', round("l_quantity||mean", 6) FROM s
            UNION ALL SELECT 'l_quantity', 'std', round("l_quantity||std", 6) FROM s
            UNION ALL SELECT 'l_quantity', 'min', round("l_quantity||min", 6) FROM s
            UNION ALL SELECT 'l_quantity', 'q1', round("l_quantity||q1", 6) FROM s
            UNION ALL SELECT 'l_quantity', 'median', round("l_quantity||median", 6) FROM s
            UNION ALL SELECT 'l_quantity', 'q3', round("l_quantity||q3", 6) FROM s
            UNION ALL SELECT 'l_quantity', 'max', round("l_quantity||max", 6) FROM s
            UNION ALL SELECT 'l_discount', 'count', round("l_discount||count", 6) FROM s
            UNION ALL SELECT 'l_discount', 'mean', round("l_discount||mean", 6) FROM s
            UNION ALL SELECT 'l_discount', 'std', round("l_discount||std", 6) FROM s
            UNION ALL SELECT 'l_discount', 'min', round("l_discount||min", 6) FROM s
            UNION ALL SELECT 'l_discount', 'q1', round("l_discount||q1", 6) FROM s
            UNION ALL SELECT 'l_discount', 'median', round("l_discount||median", 6) FROM s
            UNION ALL SELECT 'l_discount', 'q3', round("l_discount||q3", 6) FROM s
            UNION ALL SELECT 'l_discount', 'max', round("l_discount||max", 6) FROM s
        """,
        "iqr_outliers": """
            WITH q AS (
              SELECT quantile_cont(value, 0.25) AS q1,
                     quantile_cont(value, 0.75) AS q3
              FROM events
            )
            SELECT CAST(sum(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                               OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                          THEN 1 ELSE 0 END) AS BIGINT) AS outliers_value
            FROM events e CROSS JOIN q
        """,
        "text_colstats": """
            SELECT count(DISTINCT source) AS n_unique_source,
                   round(avg(length(text)), 6) AS avg_text_length,
                   count(DISTINCT lang) AS n_unique_lang
            FROM documents
        """,
        "mode_stats": """
            SELECT 'source' AS column,
                   count(DISTINCT source) AS n_unique,
                   (SELECT source FROM documents GROUP BY source
                    ORDER BY count(*) DESC, source ASC LIMIT 1) AS mode_value,
                   round(avg(length(source)), 6) AS avg_length
            FROM documents
            UNION ALL
            SELECT 'lang',
                   count(DISTINCT lang),
                   (SELECT lang FROM documents GROUP BY lang
                    ORDER BY count(*) DESC, lang ASC LIMIT 1),
                   round(avg(length(lang)), 6)
            FROM documents
        """,
        "snr": """
            WITH s AS (
              SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
              FROM events GROUP BY 1
            )
            SELECT event_type,
                   round((mu / sigma) * (mu / sigma), 6) AS snr,
                   round(log2(1 + (mu / sigma) * (mu / sigma)), 6)
                     AS channel_capacity_bits
            FROM s
        """,
        "pipeline_zscore_by_split": """
            WITH ordered AS (
              SELECT event_id, value,
                     row_number() OVER (ORDER BY ts, event_id) - 1 AS pos
              FROM events
            ), n AS (SELECT count(*) AS total FROM events),
            base AS (
              SELECT total,
                     CAST(floor(total * 0.5) AS BIGINT) AS c1,
                     CAST(floor(total * 0.1) AS BIGINT) AS c2
              FROM n
            ), alloc AS (
              SELECT total, c1, c2, total - (c1 + 5 * c2) AS rem FROM base
            ), counts AS (
              SELECT c1 + CASE WHEN rem > 0 THEN 1 ELSE 0 END AS k1,
                     c2 + CASE WHEN rem > 1 THEN 1 ELSE 0 END AS k2,
                     c2 + CASE WHEN rem > 2 THEN 1 ELSE 0 END AS k3,
                     c2 + CASE WHEN rem > 3 THEN 1 ELSE 0 END AS k4,
                     c2 + CASE WHEN rem > 4 THEN 1 ELSE 0 END AS k5,
                     c2 AS k6
              FROM alloc
            ), labeled AS (
              SELECT o.value,
                     CASE
                       WHEN o.pos < c.k1 THEN 'd1'
                       WHEN o.pos < c.k1 + c.k2 THEN 'd2'
                       WHEN o.pos < c.k1 + c.k2 + c.k3 THEN 'd3'
                       WHEN o.pos < c.k1 + c.k2 + c.k3 + c.k4 THEN 'd4'
                       WHEN o.pos < c.k1 + c.k2 + c.k3 + c.k4 + c.k5 THEN 'd5'
                       ELSE 'd6'
                     END AS split_id
              FROM ordered o CROSS JOIN counts c
            ), fit AS (
              SELECT avg(value) AS mu,
                     CASE WHEN COALESCE(stddev_samp(value), 0) = 0 THEN 1.0
                          ELSE stddev_samp(value) END AS sigma
              FROM labeled WHERE split_id IN ('d1', 'd2')
            )
            SELECT l.split_id,
                   round(avg((l.value - f.mu) / f.sigma), 6) AS mean_norm,
                   round(stddev_samp((l.value - f.mu) / f.sigma), 6) AS std_norm,
                   count(*) AS n
            FROM labeled l CROSS JOIN fit f
            GROUP BY 1
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                     AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY 1, 2
        """,
        "revenue_by_priority": """
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1
        """,
        "region_revenue": """
            SELECT r_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1
        """,
        "rollup_grouping": """
            SELECT event_type, date_trunc('day', ts) AS day,
                   count(*) AS n_points,
                   round(sum(value), 4) AS sum_v
            FROM events
            GROUP BY ROLLUP (event_type, date_trunc('day', ts))
        """,
        "top_customers": """
            WITH rev AS (
              SELECT o_custkey,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY 1
            )
            SELECT c_custkey, c_name, revenue
            FROM rev JOIN customer ON o_custkey = c_custkey
            ORDER BY revenue DESC, c_custkey
            LIMIT 10
        """,
        # ---------------------------------------------- formerly rows-only
        "interpolate_hourly": """
            WITH t1h AS (
              SELECT event_type, date_trunc('hour', ts) AS bucket_start,
                     avg(value) AS mv
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT event_type, min(bucket_start) AS t0, max(bucket_start) AS t1
              FROM t1h GROUP BY 1
            ), spine AS (
              SELECT b.event_type,
                     unnest(generate_series(b.t0, b.t1, INTERVAL 1 HOUR))
                       AS bucket_start
              FROM bounds b
            ), filled AS (
              SELECT s.event_type, s.bucket_start, t.mv
              FROM spine s LEFT JOIN t1h t
                ON s.event_type = t.event_type
               AND s.bucket_start = t.bucket_start
            ), pos AS (
              SELECT *, row_number() OVER (PARTITION BY event_type
                                           ORDER BY bucket_start) AS p
              FROM filled
            ), ctx AS (
              SELECT event_type, bucket_start, mv, p,
                last_value(mv IGNORE NULLS) OVER wf AS prev_val,
                last_value(CASE WHEN mv IS NOT NULL THEN p END IGNORE NULLS)
                  OVER wf AS prev_pos,
                first_value(mv IGNORE NULLS) OVER wb AS next_val,
                first_value(CASE WHEN mv IS NOT NULL THEN p END IGNORE NULLS)
                  OVER wb AS next_pos
              FROM pos
              WINDOW wf AS (PARTITION BY event_type ORDER BY bucket_start
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     wb AS (PARTITION BY event_type ORDER BY bucket_start
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
            )
            SELECT event_type, bucket_start,
              round(CASE WHEN mv IS NOT NULL THEN mv
                         WHEN next_pos IS NULL THEN prev_val
                         WHEN prev_pos IS NULL THEN NULL
                         ELSE prev_val + (next_val - prev_val)
                              * ((p - prev_pos) / (next_pos - prev_pos))
                    END, 6) AS mean_v
            FROM ctx
        """,
        "ema_unbias": """
            WITH lv AS (
              SELECT event_id, event_type, value,
                     list(value) OVER (PARTITION BY event_type
                                       ORDER BY ts, event_id
                                       ROWS BETWEEN 699 PRECEDING
                                                AND CURRENT ROW) AS l
              FROM events
            )
            SELECT event_id, event_type,
                   round(value -
                     list_sum(list_transform(
                       l, (x, i) -> x * pow(0.9, len(l) - i)))
                     / list_sum(list_transform(
                       l, (x, i) -> CASE WHEN x IS NULL THEN NULL
                                         ELSE pow(0.9, len(l) - i) END)),
                     4) AS v_unbiased
            FROM lv
        """,
        "minhash_neardups": _minhash_oracle_sql(),
        "simhash_neardups": _simhash_oracle_sql(),
        "tier_compression_roundtrip": """
            -- lossless-codec invariant: the decoded 1h tier must equal the
            -- directly-aggregated 1h tier, so the per-source totals of the
            -- decode output must match this direct aggregation
            WITH tier AS (
              SELECT event_type AS source, date_trunc('hour', ts) AS b,
                     sum(value) AS sum_v
              FROM events GROUP BY 1, 2
            )
            SELECT source, count(*) AS n_buckets,
                   round(sum(sum_v), 4) AS sum_v_total
            FROM tier GROUP BY 1
        """,
        "mutual_info": _mutual_info_oracle_sql(),
        "fft_peaks": _fft_peaks_oracle_sql(),
        "lsh_topk": _lsh_topk_oracle_sql(),
        "embedding_neardups": _embedding_neardups_oracle_sql(),
        # pure-arithmetic mirror of synth_media_sql's md5 parameter layout:
        # payload sizes from the BMP/WAV/frame-container byte formulas,
        # content levels from the constant fill/amplitude, resize boxes from
        # the same double-precision least/ceil, frame counts from nf — no
        # decoding anywhere on the oracle side (see q_multimodal_pipeline)
        "multimodal_pipeline": """
            WITH p AS (
              SELECT CAST(doc_id AS VARCHAR) AS media_id,
                     md5(CAST(doc_id AS VARCHAR)) AS m
              FROM documents
            ), d AS (
              SELECT media_id,
                ('0x' || substr(m, 1, 2))::BIGINT % 3 AS mi,
                8 + ('0x' || substr(m, 3, 2))::BIGINT % 56 AS img_w,
                8 + ('0x' || substr(m, 5, 2))::BIGINT % 40 AS img_h,
                ('0x' || substr(m, 7, 2))::BIGINT AS fill,
                2000 + ('0x' || substr(m, 9, 4))::BIGINT % 6000 AS n,
                ('0x' || substr(m, 13, 4))::BIGINT % 20001 - 10000 AS amp,
                8 + ('0x' || substr(m, 3, 2))::BIGINT % 16 AS vid_w,
                8 + ('0x' || substr(m, 5, 2))::BIGINT % 8 AS vid_h,
                2 + ('0x' || substr(m, 17, 1))::BIGINT % 4 AS nf
              FROM p
            ), e AS (
              SELECT media_id, mi, fill, n, amp, nf,
                CASE mi WHEN 0 THEN img_w WHEN 2 THEN vid_w END AS w,
                CASE mi WHEN 0 THEN img_h WHEN 2 THEN vid_h END AS h
              FROM d
            ), t AS (
              SELECT *,
                CASE WHEN mi <> 1
                     THEN least(32.0 / w, 32.0 / h, 1.0) END AS scale,
                CASE WHEN mi <> 1
                     THEN 3 * w + (4 - (3 * w) % 4) % 4 END AS stride
              FROM e
            )
            SELECT media_id,
              CASE mi WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                      ELSE 'video' END AS modality,
              CAST(CASE mi WHEN 0 THEN 54 + h * stride
                           WHEN 1 THEN 44 + 2 * n
                           ELSE nf * (54 + h * stride) END AS INT)
                AS payload_bytes,
              CAST(w AS INT) AS dec_w,
              CAST(h AS INT) AS dec_h,
              CAST(CASE WHEN mi = 1 THEN abs(amp) ELSE fill END AS INT)
                AS content_level,
              CAST(CASE WHEN mi = 1 THEN n END AS INT) AS n_samples_dec,
              CAST(ceil(w * scale) AS INT) AS target_width,
              CAST(ceil(h * scale) AS INT) AS target_height,
              CAST(CASE WHEN mi = 2 THEN nf ELSE 0 END AS INT)
                AS n_frames_plan,
              CAST(CASE WHEN mi = 2 THEN nf ELSE 0 END AS INT)
                AS n_frames_real,
              CAST(CASE WHEN mi = 0 THEN
                     54 + CAST(ceil(h * scale) AS BIGINT)
                        * (3 * CAST(ceil(w * scale) AS BIGINT)
                           + (4 - (3 * CAST(ceil(w * scale) AS BIGINT)) % 4)
                             % 4)
                   END AS INT) AS resized_bytes
            FROM t
        """,
    }
