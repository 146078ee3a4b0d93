"""Generate docs/PLANS.md: physical-plan evidence for key operators."""
import io, sys, contextlib
sys.path.insert(0, "/root/repo")
from preprocessor_spark import get_spark
import __spark_entry__ as e
import pyspark.sql.functions as F

spark = get_spark("plans", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.01"

def plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()

sections = []

def add(title, df, commentary):
    sections.append((title, commentary, plan(df)))

add(
    "Tier-0 rollup aggregate (rollup_1h)",
    e.q_rollup_1h(spark, SF),
    "Partial+final HashAggregate with one exchange; the scan reads only the\n"
    "referenced columns (ReadSchema) — map-side combine collapses each input\n"
    "partition before the shuffle.",
)
add(
    "Filter + projection pushdown (trim_time_range)",
    e.q_trim_time_range(spark, SF),
    "The time-range trim is a scan predicate (PushedFilters) — on a\n"
    "time-partitioned table this prunes whole partitions; no separate\n"
    "filter stage survives above the scan.",
)
add(
    "Broadcast param application (zscore_value)",
    e.q_zscore_value(spark, SF),
    "Fitted per-group stats join back via BroadcastHashJoin — the fact side\n"
    "never shuffles; the normalization arithmetic runs inside the same\n"
    "WholeStageCodegen as the scan.",
)
add(
    "Gap-fill spine join (rollup_gapfill_1h)",
    e.q_rollup_gapfill_1h(spark, SF),
    "The dense spine explodes from a one-row-per-series bounds aggregate and\n"
    "joins the tier; only tier-sized data moves.",
)
add(
    "MA unbias window (ma_unbias)",
    e.q_ma_unbias(spark, SF),
    "Single Window exec over (event_type) ordered runs; the trailing\n"
    "rowsBetween frame is computed in one pass, no Python. The chunked\n"
    "variant (Unbiaser(chunk_rows=...)) splits series into overlapping\n"
    "chunks for series-count-independent parallelism.",
)

add(
    "MinHash signature (minhash_neardups, signature stage)",
    __import__("preprocessor_spark.functions.dedup", fromlist=["x"]).minhash_lsh_pairs(
        spark.read.parquet(f"{SF}/documents.parquet"),
        jaccard_threshold=0.5, shingle_mode="word", shingle_k=3,
    ),
    "Signatures are an explode + 64 codegen'd min-aggregates with map-side\n"
    "partial aggregation — NOT higher-order array lambdas, which run on the\n"
    "interpreted expression path (~10x slower). The band self-join keys on\n"
    "(band, band-hash) so only colliding docs meet.",
)

def _tier_plans():
    from preprocessor_spark.rollup.tiers import (
        DEFAULT_TIERS,
        RollupTree,
        duration_seconds,
        spine_from_bounds,
    )
    from preprocessor_spark.synth import token_sequences

    corpus = token_sequences(spark, 50_000)
    tree = RollupTree(time_col="ts", series_cols=["source"], value_col="n_tok")
    bounds = [
        tuple(r)
        for r in corpus.groupBy("source")
        .agg(
            F.min(F.unix_timestamp("ts")).alias("t0"),
            F.max(F.unix_timestamp("ts")).alias("t1"),
        )
        .collect()
    ]
    spine = spine_from_bounds(
        spark, bounds, ["source"], duration_seconds(DEFAULT_TIERS[0].duration)
    )
    fused = tree.base_aggregate_with_spine(corpus, DEFAULT_TIERS[0], spine)
    dense_reagg = tree.reaggregate(fused, DEFAULT_TIERS[1])
    return fused, dense_reagg


_fused, _dense = _tier_plans()
add(
    "Fused tier-0 aggregate + gap fill (base_aggregate_with_spine)",
    _fused,
    "Gap fill costs NO join: null-valued spine seed rows ride the facts'\n"
    "union into ONE partial+final aggregate (count of non-null values), so\n"
    "the tier tree has a single exchange per tier and no join stages.",
)
add(
    "Dense tier re-aggregation (1h from gap-filled 5m)",
    _dense,
    "A gap-filled tier is dense over the floored per-series range and tier\n"
    "periods nest, so the coarse tier re-aggregates it WITH gap rows —\n"
    "reproducing the coarse spine exactly with zero spine/join work.",
)


def _chunked_ma_plan():
    from preprocessor_spark.operators.unbiaser import Unbiaser
    from preprocessor_spark.synth import token_sequences

    corpus = token_sequences(spark, 20_000).withColumn(
        "v", F.col("n_tok").cast("double")
    )
    return Unbiaser(
        method="ma",
        window_size=5,
        series_cols=["source"],
        value_cols=["v"],
        tiebreak_cols=["doc_id"],
        chunk_rows=2_000,
    ).transform(corpus)


add(
    "Chunked MA unbias — ONE full-width shuffle (Unbiaser(chunk_rows=...))",
    _chunked_ma_plan(),
    "Chunk ids come from driver-side packing of value-range time buckets\n"
    "(one light count aggregate) and reach rows via a BroadcastHashJoin;\n"
    "the only hash Exchange is the (series, chunk) window itself —\n"
    "parallelism is series x chunks with exact trailing-window semantics.",
)

add(
    "Exact pair cosine with a Generate pushdown barrier (embedding_pairs)",
    e.q_embedding_pairs(spark, SF),
    "Catalyst substitutes a filter on a computed cosine through the\n"
    "projection INTO the nested-loop join condition, where it evaluates on\n"
    "the interpreted Predicate path (measured 16.9s). The cosine is emitted\n"
    "through explode(array(...)) — predicate pushdown cannot cross a\n"
    "Generate — so the join condition stays the cheap id inequality, each\n"
    "side's norm is computed once BELOW the join, and the per-pair dot is\n"
    "one unrolled codegen expression above it (9x faster, bit-identical).",
)
add(
    "LSH bucket probe with driver-side constants (lsh_topk)",
    e.q_lsh_topk(spark, SF),
    "Plane weights are md5-derived ONCE on the driver and inlined as scalar\n"
    "literals (no per-row md5, no interpreted HOFs); the query's own bucket\n"
    "and norm are computed in Python with the identical fold order, so the\n"
    "plan is a single scan + codegen filter + TakeOrderedAndProject.",
)

add(
    "Decontamination broadcast probe (decontaminate)",
    e.q_decontaminate(spark, SF),
    "The corpus-sized exploded n-gram stream flows scan → explode →\n"
    "BroadcastHashJoin probe with NO exchange (per-doc distinct is\n"
    "array-local); the only shuffles are the per-doc hit count (hits only)\n"
    "and the small eval set's distinct inside the broadcast build.",
)

add(
    "Mergeable tier histogram (tier_hist_1h)",
    e.q_tier_hist_1h(spark, SF),
    "One partial+final HashAggregate computing all bins as conditional-sum\n"
    "lanes inside WholeStageCodegen — the histogram rides the same exchange\n"
    "as the tier's other statistics; posexplode to long form happens on\n"
    "|buckets| rows, after the aggregate.",
)

add(
    "Incremental tier merge (rollup_incremental)",
    e.q_rollup_incremental(spark, SF),
    "Two independent partial aggregates (base, delta) union into ONE final\n"
    "re-aggregation — sums of sums, min of mins — the fold every O(delta)\n"
    "refresh rests on; no join, no sort.",
)


def _granger_gram_plan():
    from preprocessor_spark.operators.feature_selector import granger_lag_frame

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.date_trunc("hour", "ts").alias("b"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("y"),
            F.avg("value").alias("x"),
        )
    )
    lagged = granger_lag_frame(ev, ["x"], "y", "b", max_lag=2, chunk_rows=500)
    yl = ["__y_l1", "__y_l2"]
    xl = ["__x_l1", "__x_l2"]
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for a in [*yl, *xl, "y"]:
        aggs.append(F.sum(a).alias(f"s__{a}"))
        for b in [*yl, *xl, "y"]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"s__{a}__{b}"))
    return lagged.agg(*aggs)


add(
    "Granger Gram-matrix aggregate (granger_select)",
    _granger_gram_plan(),
    "The nested-model F-test's normal equations are fused sum/sum-of-\n"
    "product lanes in ONE partial+final HashAggregate over the chunked lag\n"
    "window — the only wide exchange is the (chunk) window sort itself;\n"
    "what crosses the final-merge wire is a few hundred doubles regardless\n"
    "of row count, and the (2L+1)-square solves run on the driver.",
)

with open("/root/repo/docs/PLANS.md", "w") as f:
    f.write("# Physical-plan evidence\n\n")
    f.write(
        "Captured with `.explain('formatted')` at sf0.01 (regenerate with\n"
        "`python tools/gen_plans.py`). What to look for: `PushedFilters` /\n"
        "`ReadSchema` on scans (pushdown + pruning), partial+final\n"
        "`HashAggregate` pairs, `BroadcastHashJoin` for param application,\n"
        "and wide `WholeStageCodegen` spans (no per-row Python anywhere).\n\n"
    )
    for title, commentary, p in sections:
        f.write(f"## {title}\n\n{commentary}\n\n```\n{p}\n```\n\n")
print("written")
