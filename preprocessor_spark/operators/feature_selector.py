"""Feature selector — column-subset selection persisted as params and applied
as pure projection (→ Catalyst column pruning → the scan reads only the
selected columns; the north rule's "feature-selector semantics mapped to
partition-pruning column projections").

Reference semantics:
  * select_single / select_multi — keep the i-th / listed column indices
    (app/plugins/plugin_feature_selector_pre.py:57-60);
  * persisted params are just ``{method, selected_features}``
    (app/plugins/plugin_feature_selector_post.py:48-51) — regardless of HOW
    selection ran, application is projection (SURVEY §2.7 key insight);
  * ACF/PACF screen (app/plugins/plugin_feature_selector_pre.py:86-120):
    the reference computes UNNORMALIZED autocorrelation vs a 0.05 threshold
    (effectively always true — documented quirk); the faithful-to-intent
    Spark version screens on real lag correlation |corr(x, lag_k(x))|;
  * supervised selectors (LASSO / ElasticNet — SURVEY §2.7 F1/F2) via
    pyspark.ml LinearRegression with elastic-net penalty; output is again
    only a column list;
  * Granger selection (F5) is an unimplemented dead path in the reference
    (plugin_feature_selector_pre.py:71-73 calls a method that does not
    exist) — intentionally NOT built.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from preprocessor_spark.params import StageParams


class FeatureSelector:
    name = "feature_selector"

    def __init__(
        self,
        method: str = "select_multi",
        indices: list[int] | None = None,
        names: list[str] | None = None,
        keep_cols: list[str] | None = None,  # always-kept keys (time, ids)
        lag_corr_threshold: float = 0.05,
        max_lag: int = 10,
        lag_chunk_rows: int = 1_000_000,  # chunk size of the lag window
    ):
        self.method = method
        self.indices = indices or []
        self.names = names or []
        self.keep_cols = keep_cols or []
        self.lag_corr_threshold = lag_corr_threshold
        self.max_lag = max_lag
        self.lag_chunk_rows = lag_chunk_rows

    def fit(self, df: DataFrame) -> StageParams:
        if self.method in ("select_single", "select_multi"):
            selected = self.names or [df.columns[i] for i in self.indices]
        elif self.method == "lag_corr":
            selected = self._lag_corr_select(df)
        else:
            raise ValueError(f"unknown selection method: {self.method}")
        return StageParams(
            stage=self.name,
            method=self.method,
            params={"selected_features": selected, "keep_cols": self.keep_cols},
        )

    def transform(self, df: DataFrame, params: StageParams) -> DataFrame:
        cols = params.params["keep_cols"] + [
            c for c in params.params["selected_features"] if c in df.columns
        ]
        return df.select(*cols)

    def _lag_corr_select(self, df: DataFrame) -> list[str]:
        """Keep numeric columns with |corr(x, lag_k(x))| > threshold for any
        k ≤ max_lag (SURVEY §2.5 W12 screen). One window pass builds all lags,
        one aggregate computes every corr — two shuffles total regardless of
        column/lag count.

        The lag window is CHUNKED (``chunked_assignment``, carry = max_lag
        rows), never a global single-partition sort: each chunk head reads
        its true predecessors from the carried tail of the previous chunk,
        so the lag pairs — and therefore every corr — are exactly those of
        ``lag() OVER (ORDER BY order)`` at any parallelism. Non-bucketable
        (string) order keys fall back to the global window."""
        from pyspark.sql import Window

        num = [
            c
            for c, t in df.dtypes
            if t in ("double", "float", "int", "bigint") and c not in self.keep_cols
        ]
        if not num:
            return []
        order = self.keep_cols[0] if self.keep_cols else num[0]
        from preprocessor_spark.operators.positions import (
            BUCKETABLE_DTYPE_PREFIXES,
            chunked_assignment,
        )

        order_dtype = dict(df.dtypes)[order]
        if order_dtype.startswith(BUCKETABLE_DTYPE_PREFIXES):

            chunked = chunked_assignment(
                df.select(order, *num) if order not in num else df.select(*num),
                order,
                chunk_rows=self.lag_chunk_rows,
                carry_rows=self.max_lag,
            )
            w = Window.partitionBy("__chunk").orderBy(order)
            lagged = chunked.select(
                *num,
                "__aug",
                *[
                    F.lag(c, k).over(w).alias(f"__{c}_l{k}")
                    for c in num
                    for k in range(1, self.max_lag + 1)
                ],
            ).filter(~F.col("__aug"))
        else:
            w = Window.orderBy(order)
            lagged = df.select(
                *num,
                *[
                    F.lag(c, k).over(w).alias(f"__{c}_l{k}")
                    for c in num
                    for k in range(1, self.max_lag + 1)
                ],
            )
        aggs = [
            F.corr(c, f"__{c}_l{k}").alias(f"{c}__k{k}")
            for c in num
            for k in range(1, self.max_lag + 1)
        ]
        row = lagged.agg(*aggs).collect()[0]
        out = []
        for c in num:
            vals = [row[f"{c}__k{k}"] for k in range(1, self.max_lag + 1)]
            if any(v is not None and abs(v) > self.lag_corr_threshold for v in vals):
                out.append(c)
        return out


def boruta_select(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iterations: int = 5,
    seed: int = 1,
    max_depth: int = 5,
    num_trees: int = 50,
) -> list[str]:
    """F4 Boruta-style all-relevant selection, fully distributed (the
    reference drives sklearn BorutaPy on the driver,
    app/plugins/plugin_feature_selector_post.py:110-126; this container has
    no sklearn/boruta, and driver-side fitting wouldn't survive corpus
    scale anyway).

    Boruta shadow scheme on pyspark.ml: each iteration appends a shadow
    copy of the feature block taken from a pseudo-random OTHER row
    (deterministic hash-order positions + coprime rotation — distribution
    preserved, feature–label pairing broken), fits a
    RandomForestRegressor, and counts a HIT for features whose importance
    exceeds the best shadow importance. Features with hits in a majority of
    iterations are confirmed. Output is a column list — applied downstream
    as pure projection (SURVEY §2.7 key insight)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor

    from preprocessor_spark.operators.positions import grouped_positions

    clean = df.na.drop(subset=[*feature_cols, label_col]).select(
        *feature_cols, label_col
    )
    n_rows = clean.count()
    hits = {c: 0 for c in feature_cols}
    for it in range(n_iterations):
        hashed = clean.withColumn(
            "__h", F.xxhash64(F.lit(seed + it), F.struct(*clean.columns))
        )
        posed = grouped_positions(hashed, ["__h"], pos_col="__pos").drop("__h")
        shift = (n_rows // 2) | 1  # odd → walks the whole cycle for even n
        donor = posed.select(
            ((F.col("__pos") + shift) % n_rows).alias("__pos"),
            *[F.col(c).alias(f"__sh_{c}") for c in feature_cols],
        )
        shadow = posed.join(donor, "__pos").drop("__pos")
        all_cols = feature_cols + [f"__sh_{c}" for c in feature_cols]
        vec = VectorAssembler(inputCols=all_cols, outputCol="__f")
        rf = RandomForestRegressor(
            featuresCol="__f",
            labelCol=label_col,
            maxDepth=max_depth,
            numTrees=num_trees,
            seed=seed + it,
        )
        model = rf.fit(vec.transform(shadow))
        imp = model.featureImportances.toArray()
        n = len(feature_cols)
        best_shadow = max(imp[n:]) if n < len(imp) else 0.0
        for i, c in enumerate(feature_cols):
            if imp[i] > best_shadow:
                hits[c] += 1
    threshold = n_iterations / 2
    return [c for c in feature_cols if hits[c] > threshold]


def lasso_select(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    alpha: float = 0.001,
    l1_ratio: float = 1.0,
) -> list[str]:
    """Supervised selection via distributed elastic-net regression
    (reference F1/F2, app/plugins/plugin_feature_selector_post.py:59-92):
    fit LinearRegression(regParam=alpha, elasticNetParam=l1_ratio), keep
    features with |coef| > 0. Runs on executors via pyspark.ml (no sklearn)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    vec = VectorAssembler(inputCols=feature_cols, outputCol="__features")
    lr = LinearRegression(
        featuresCol="__features",
        labelCol=label_col,
        regParam=alpha,
        elasticNetParam=l1_ratio,
        standardization=True,
    )
    model = lr.fit(vec.transform(df.na.drop(subset=[*feature_cols, label_col])))
    return [c for c, w in zip(feature_cols, model.coefficients) if abs(w) > 0.0]
