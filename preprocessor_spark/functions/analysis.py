"""Series diagnostics — the dataset_analyzer surface of the reference
(SURVEY §2.5 W11-W14, §2.6 M8) as distributed operators.

  * lag diffs / returns (dataset_analyzer.py:105) — native window;
  * autocorrelation at lags 1..k (dataset_analyzer.py:168) — corr of lagged
    columns, one window pass + one aggregate for ALL lags;
  * SNR + Shannon-Hartley channel capacity (dataset_analyzer.py:121-156) —
    scalar math over one aggregate;
  * FFT spectrum + top-k peaks (dataset_analyzer.py:158-165) — numpy rFFT
    per series inside applyInPandas (inherently per-series sequential;
    diagnostic, not pipeline-critical);
  * mutual-information feature scoring (reference F3 uses sklearn
    mutual_info_regression on the driver; this container has no sklearn, so
    the engine implements the binned-histogram MI estimator DISTRIBUTED:
    quantile-bin X and y, then MI = Σ p(x,y)·log(p(x,y)/(p(x)p(y))) from one
    groupBy per feature — scales to any table size, no driver collection).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def lag_diff(
    df: DataFrame,
    value_col: str,
    time_col: str = "ts",
    series_cols: list[str] | None = None,
    lag: int = 1,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W11: x − lag_k(x) — the delta primitive behind delta-of-delta.
    ``tiebreak_cols`` pin the order under duplicate timestamps (W5
    determinism)."""
    w = Window.partitionBy(*(series_cols or [])).orderBy(
        time_col, *(tiebreak_cols or [])
    )
    return df.withColumn(
        f"{value_col}_diff", F.col(value_col) - F.lag(value_col, lag).over(w)
    )


def autocorrelation(
    df: DataFrame,
    value_col: str,
    time_col: str = "ts",
    series_cols: list[str] | None = None,
    max_lag: int = 10,
) -> DataFrame:
    """W12: corr(x, lag_k(x)) for k = 1..max_lag per series — one window
    pass builds all lag columns, one aggregate computes every corr."""
    series_cols = series_cols or []
    w = Window.partitionBy(*series_cols).orderBy(time_col)
    lagged = df.select(
        *series_cols,
        value_col,
        *[F.lag(value_col, k).over(w).alias(f"__l{k}") for k in range(1, max_lag + 1)],
    )
    aggs = [
        F.corr(value_col, f"__l{k}").alias(f"lag_{k}") for k in range(1, max_lag + 1)
    ]
    return lagged.groupBy(*series_cols).agg(*aggs) if series_cols else lagged.agg(*aggs)


def snr_stats(df: DataFrame, value_col: str, by: list[str] | None = None) -> DataFrame:
    """M8: SNR = (mean/std)^2 and Shannon-Hartley capacity f·log2(1+snr)
    with f = 1 sample/period."""
    g = df.groupBy(*by) if by else df.groupBy()
    out = g.agg(
        F.mean(value_col).alias("mu"), F.stddev_samp(value_col).alias("sigma")
    )
    snr = (F.col("mu") / F.col("sigma")) ** 2
    return out.select(
        *(by or []),
        F.round(snr, 6).alias("snr"),
        F.round(F.log2(1 + snr), 6).alias("channel_capacity_bits"),
    )


def fft_top_peaks(
    df: DataFrame,
    value_col: str,
    time_col: str = "ts",
    series_cols: list[str] | None = None,
    top_k: int = 5,
) -> DataFrame:
    """W13: per-series |rFFT| magnitude spectrum (dB), top-k peak
    frequencies. numpy per series group via applyInPandas."""
    series_cols = series_cols or []
    out_schema = T.StructType(
        [df.schema[c] for c in series_cols]
        + [
            T.StructField("peak_rank", T.IntegerType()),
            T.StructField("freq_index", T.IntegerType()),
            T.StructField("magnitude_db", T.DoubleType()),
        ]
    )
    vc, tc, sc = value_col, time_col, list(series_cols)

    def spectrum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(tc)
        x = pdf[vc].to_numpy(np.float64)
        x = x[~np.isnan(x)]
        if len(x) < 4:
            return pd.DataFrame({f.name: [] for f in out_schema.fields})
        mag = np.abs(np.fft.rfft(x - x.mean()))[1:]  # drop DC
        db = 20 * np.log10(np.maximum(mag, 1e-12))
        # stable (db desc, freq asc) ordering — deterministic and identical
        # to the SQL oracle's ORDER BY db DESC, freq ASC
        order = np.lexsort((np.arange(len(db)), -db))[:top_k]
        rows = {c: [pdf[c].iloc[0]] * len(order) for c in sc}
        rows["peak_rank"] = np.arange(1, len(order) + 1, dtype=np.int32)
        rows["freq_index"] = (order + 1).astype(np.int32)
        rows["magnitude_db"] = db[order]
        return pd.DataFrame(rows)

    if series_cols:
        return df.groupBy(*series_cols).applyInPandas(spectrum, out_schema)
    return (
        df.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(lambda p: spectrum(p.drop(columns="__g")), out_schema)
    )


def mutual_information(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    bins: int = 16,
    edge_method: str = "approx",
) -> DataFrame:
    """Distributed binned MI estimate per feature vs label (F3 analog).

    Quantile bin edges from one percentile aggregate; joint/marginal
    probabilities from one groupBy per feature (cheap: ≤ bins² rows each).
    Returns (feature, mi_bits) sorted descending — take the top-N as the
    selected subset, applied downstream as pure projection (P5).

    edge_method picks the quantile estimator for the bin edges:
    - "approx" (default): `approx_percentile` — a bounded-memory mergeable
      sketch, the only shape that survives 10^12 rows (exact percentile
      builds a value→count hashmap per task whose merged size is the
      column's distinct count; on a high-cardinality column that is an
      unbounded single-reducer merge). Edge placement error ≤ 1e-4 of
      rank, which moves a bin boundary by at most a few rows — noise next
      to the binning quantization itself.
    - "exact": `percentile` — bit-matches DuckDB's quantile_cont, used by
      the oracle-checked driver query; fine up to ~10^8 rows or on
      low-cardinality columns.
    """
    probs = [i / bins for i in range(1, bins)]
    if edge_method not in ("approx", "exact"):
        raise ValueError(f"edge_method must be approx|exact, got {edge_method!r}")
    fn = "percentile" if edge_method == "exact" else "approx_percentile"
    acc = "" if edge_method == "exact" else ", 10000"
    edge_aggs = []
    for c in [*feature_cols, label_col]:
        # backtick the identifier: these are COLUMN NAMES by contract, and
        # unquoted interpolation would mis-parse 'a-b' as a subtraction or
        # 'a.b' as struct access
        edge_aggs.append(
            F.expr(
                f"{fn}(`{c}`, array({', '.join(str(p) for p in probs)}){acc})"
            ).alias(f"{c}__edges")
        )
    edges = df.agg(*edge_aggs).collect()[0]

    def bin_expr(c: str):
        # bucket id by quantile edge ladder: bin i ⇔ x ≤ edges[i], else
        # last. NULL values must yield a NULL bin (dropped below), not
        # fall through the when-ladder into the TOP bin — folding
        # missingness into the max-value bin fabricates a joint-histogram
        # cell and distorts the MI of any column with nulls
        e = [x for x in (edges[f"{c}__edges"] or []) if x is not None]
        expr = F.lit(len(e))
        for i in reversed(range(len(e))):
            expr = F.when(F.col(c) <= F.lit(e[i]), i).otherwise(expr)
        return F.when(F.col(c).isNotNull(), expr)

    # ONE scan per ≤16-feature group (not one per feature): every feature's
    # bin id is computed in the same projection and exploded to
    # (feature, xb, yb) rows. The explode never reaches the wire — the
    # groupBy's map-side partial aggregate collapses each task to
    # ≤ |features|·bins² rows before the shuffle, so the fused shape costs
    # one table scan + a tiny shuffle regardless of feature count. Groups
    # of 16 keep the stacked when-ladder bin expressions well inside
    # janino's 64 KB generated-method limit (the codegen cliff the pair
    # scorers hit at round 5).
    results = []
    yb = bin_expr(label_col).alias("__yb")
    for g in range(0, len(feature_cols), 16):
        group = feature_cols[g : g + 16]
        pairs = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("__f"),
                            bin_expr(c).cast("int").alias("__xb"),
                        )
                        for c in group
                    ]
                )
            ).alias("__p"),
            yb,
        )
        joint = (
            pairs.select("__p.__f", "__p.__xb", "__yb")
            # pairwise-complete semantics: a row contributes to a feature's
            # histogram only when BOTH that feature and the label are
            # non-null (bin_expr yields NULL bins for null values)
            .filter(F.col("__xb").isNotNull() & F.col("__yb").isNotNull())
            .groupBy("__f", "__xb", "__yb")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # the counts go through DOUBLE before the products: n·total and
        # px·py are long·long and overflow int64 once a dominant bin holds
        # ~3e9+ rows (ANSI mode: ARITHMETIC_OVERFLOW kills the job;
        # non-ANSI: silent wraparound → log2 of a negative → NaN MI). The
        # division result is double anyway, so this changes nothing below
        # 2^53 rows per bin.
        total = F.sum("n").over(Window.partitionBy("__f")).cast("double")
        px = F.sum("n").over(Window.partitionBy("__f", "__xb")).cast("double")
        py = F.sum("n").over(Window.partitionBy("__f", "__yb")).cast("double")
        n_d = F.col("n").cast("double")
        results.append(
            joint.select(
                F.col("__f").alias("feature"),
                ((n_d / total) * F.log2((n_d * total) / (px * py))).alias(
                    "term"
                ),
            )
            .groupBy("feature")
            .agg(F.round(F.sum("term"), 6).alias("mi_bits"))
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    # contract: one row per requested feature even on an empty/degenerate
    # input (the per-feature global .agg() shape always produced a row with
    # null mi_bits; the fused groupBy would silently drop such features)
    spark = df.sparkSession
    catalog = spark.createDataFrame(
        [(c,) for c in feature_cols], "feature string"
    )
    return catalog.join(F.broadcast(out), "feature", "left").orderBy(
        F.desc("mi_bits")
    )


def mutual_info_select(
    df: DataFrame, feature_cols: list[str], label_col: str, top_n: int = 10
) -> list[str]:
    """F3: keep the top-N features by MI (reference keeps top-10,
    app/plugins/plugin_feature_selector_post.py:94-107)."""
    mi = mutual_information(df, feature_cols, label_col).collect()
    return [r["feature"] for r in mi[:top_n]]
