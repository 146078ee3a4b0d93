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
    (plugin_feature_selector_pre.py:71-73 calls
    ``_granger_causality_feature_selection``, a method that does not exist
    in the file) — ``granger_select`` below implements what that name
    promises: per-feature Granger causality F-tests against the target,
    distributed (one chunked lag pass + fused Gram-matrix aggregates; the
    only driver-side work is a (2·max_lag+1)² solve per feature).
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
            # names AND indices combine (the CLI splits one --select-columns
            # flag into both): `names or [...]` silently discarded every
            # index whenever at least one name was given
            selected = list(
                dict.fromkeys(
                    [*self.names, *[df.columns[i] for i in self.indices]]
                )
            )
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
        keep = params.params["keep_cols"]
        # a selected name that is also a keep_col must not project twice —
        # the duplicate column poisons every downstream reference with
        # AMBIGUOUS_REFERENCE
        cols = keep + [
            c
            for c in params.params["selected_features"]
            if c in df.columns and c not in keep
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
        if not self.keep_cols:
            # the reference's ACF screen rides pandas row order; Spark has
            # no implicit row order, so lag pairs need an explicit time
            # key. Falling back to ordering by the first VALUE column
            # would make corr(x, lag(x)) of the sorted column ~1 for every
            # feature — a screen that selects everything on any input.
            raise ValueError(
                "lag_corr needs keep_cols[0] as the time/order column — "
                "lag correlations over an unordered DataFrame are "
                "meaningless"
            )
        order = self.keep_cols[0]
        from preprocessor_spark.operators.positions import (
            chunked_assignment,
            is_bucketable_dtype,
        )

        order_dtype = dict(df.dtypes)[order]
        if is_bucketable_dtype(order_dtype):

            # num excludes keep_cols, so order (keep_cols[0]) is never in it
            chunked = chunked_assignment(
                df.select(order, *num),
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


def _betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b) via the standard modified-Lentz
    continued fraction (Abramowitz & Stegun 26.5.8 / classic ``betacf``
    scheme; no scipy in this environment). Accurate to ~1e-12 for the
    moderate (a, b) an F-test produces."""
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    # symmetry: use the fast-converging side of the fraction
    if x > (a + 1.0) / (a + b + 2.0):
        return 1.0 - _betainc_reg(b, a, 1.0 - x)
    ln_front = (
        a * math.log(x)
        + b * math.log1p(-x)
        - math.log(a)
        - (math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b))
    )
    tiny = 1e-300
    c, d = 1.0, 1.0 - (a + b) * x / (a + 1.0)
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        # even step
        num = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
        d = 1.0 + num * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + num / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        # odd step
        num = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1.0))
        d = 1.0 + num * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + num / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-14:
            break
    return math.exp(ln_front) * h


def f_sf(f_stat: float, d1: float, d2: float) -> float:
    """Survival function P(F > f) of the F(d1, d2) distribution:
    I_{d2/(d2 + d1·f)}(d2/2, d1/2)."""
    if f_stat <= 0.0:
        return 1.0
    return _betainc_reg(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f_stat))


def granger_lag_frame(
    df: DataFrame,
    feature_cols: list[str],
    target_col: str,
    order_col: str,
    max_lag: int,
    chunk_rows: int | None = None,
) -> DataFrame:
    """Complete-case lag frame shared by the Granger F-test: every used
    column's lags 1..max_lag via the chunked carry window (exact
    ``lag() OVER (ORDER BY order_col)`` semantics at any parallelism;
    non-bucketable order dtypes fall back to the global window)."""
    from pyspark.sql import Window

    from preprocessor_spark.operators.positions import (
        chunked_assignment,
        is_bucketable_dtype,
    )

    L = int(max_lag)
    used = [target_col, *feature_cols]
    base = df.select(order_col, *[c for c in used if c != order_col])
    lag_exprs = lambda w: [  # noqa: E731 — local shorthand
        F.lag(c, k).over(w).alias(f"__{c}_l{k}")
        for c in used
        for k in range(1, L + 1)
    ]
    order_dtype = dict(df.dtypes)[order_col]
    if is_bucketable_dtype(order_dtype):
        chunked = chunked_assignment(
            base, order_col, chunk_rows=chunk_rows, carry_rows=L
        )
        w = Window.partitionBy("__chunk").orderBy(order_col)
        lagged = chunked.select(target_col, *feature_cols, "__aug", *lag_exprs(w))
        lagged = lagged.filter(~F.col("__aug")).drop("__aug")
    else:
        w = Window.orderBy(order_col)
        lagged = base.select(target_col, *feature_cols, *lag_exprs(w))
    lag_cols = [f"__{c}_l{k}" for c in used for k in range(1, L + 1)]
    return lagged.na.drop(subset=[target_col, *lag_cols])


def granger_select(
    df: DataFrame,
    feature_cols: list[str],
    target_col: str,
    order_col: str,
    max_lag: int = 5,
    significance_level: float = 0.05,
    chunk_rows: int | None = None,
    return_stats: bool = False,
):
    """F5: Granger-causality feature selection — keep features whose lags
    1..max_lag significantly improve an autoregressive model of the target
    (reference plugin_feature_selector_pre.py:71-73 names this method but
    never shipped a body; parameters ``max_lag`` / ``significance_level``
    follow its plugin_params, :16-17).

    Per feature x, the classic nested-model F-test:

      restricted:    y_t ~ 1 + y_{t-1..L}
      unrestricted:  y_t ~ 1 + y_{t-1..L} + x_{t-1..L}
      F = ((RSS_r − RSS_u)/L) / (RSS_u/(n − 2L − 1)),  p = F_sf(F; L, n−2L−1)

    Distributed shape: ONE chunked lag pass builds every lag column
    (exactly the ``lag() OVER (ORDER BY order_col)`` pairs at any
    parallelism, via the same carry machinery as the ACF screen), then the
    OLS normal equations come from fused sum/sum-of-product aggregates —
    map-side combined, a few hundred doubles over the wire regardless of
    row count. Only the (2L+1)×(2L+1) solves run on the driver. Rows with
    any null among the used columns are dropped (complete-case, shared by
    both models so the F-test is valid).

    Returns the selected column list, or (selected, stats) when
    ``return_stats`` — stats maps feature → {f_stat, p_value, n}.
    """
    import numpy as np

    L = int(max_lag)
    if L < 1:
        raise ValueError("max_lag must be >= 1")
    lagged = granger_lag_frame(df, feature_cols, target_col, order_col, L, chunk_rows)
    used = [target_col, *feature_cols]
    y = target_col
    yl = [f"__{y}_l{k}" for k in range(1, L + 1)]

    def _sums_for(cols_a: list[str], cols_b: list[str], sym: bool):
        out = []
        for i, a in enumerate(cols_a):
            for j, b in enumerate(cols_b):
                if sym and j < i:
                    continue
                out.append(
                    F.sum(F.col(a) * F.col(b)).alias(f"s__{a}__{b}")
                )
        return out

    # shared block: moments of [1, y lags] and the target
    shared = [
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col(y) * F.col(y)).alias("syy"),
        F.sum(y).alias("sy"),
        *[F.sum(c).alias(f"s__{c}") for c in yl],
        *_sums_for(yl, yl, sym=True),
        *_sums_for(yl, [y], sym=False),
    ]
    # fuse features in groups so a single HashAggregate never carries an
    # unbounded buffer/codegen width (same rationale as the 16-feature MI
    # groups); each group is one scan of the cached lag frame. The budget:
    # measured on 5M rows, a 230-expression Gram aggregate compiles and
    # runs 6x faster than interpreted, and 351 still compiles — cap at 256.
    per_feature = 2 * L + L * (L + 1) // 2 + L * L  # sums + sym + cross + y
    shared_n = len(shared)
    group_size = max(1, (256 - shared_n) // max(per_feature, 1))
    groups = [
        feature_cols[g : g + group_size]
        for g in range(0, len(feature_cols), group_size)
    ]
    if len(groups) > 1:
        lagged = lagged.persist()
    spark = df.sparkSession
    # whole-stage codegen bails out above spark.sql.codegen.maxFields
    # (default 100) expressions — the interpreted HashAggregate is 6x
    # slower on this exact shape (measured 10.6s -> 1.7s at 5M rows).
    # Raise it for the Gram scans only, restore even on failure.
    mf_before = spark.conf.get("spark.sql.codegen.maxFields", "100")
    rows = []
    try:
        spark.conf.set(
            "spark.sql.codegen.maxFields",
            str(max(int(mf_before), shared_n + group_size * per_feature + 64)),
        )
        for group in groups:
            aggs = list(shared)
            for c in group:
                xl = [f"__{c}_l{k}" for k in range(1, L + 1)]
                aggs += [F.sum(cc).alias(f"s__{cc}") for cc in xl]
                aggs += _sums_for(xl, xl, sym=True)
                aggs += _sums_for(xl, yl, sym=False)
                aggs += _sums_for(xl, [y], sym=False)
            rows.append((group, lagged.agg(*aggs).collect()[0]))
    finally:
        spark.conf.set("spark.sql.codegen.maxFields", mf_before)
        if len(groups) > 1:
            lagged.unpersist()

    def _gram(row, cols: list[str]):
        """X'X, X'y for design [1, *cols] from the aggregate row."""
        p = len(cols) + 1
        xtx = np.zeros((p, p))
        xty = np.zeros(p)
        n = row["n"]
        xtx[0, 0] = n
        xty[0] = row["sy"]
        for i, a in enumerate(cols, start=1):
            xtx[0, i] = xtx[i, 0] = row[f"s__{a}"]
            xty[i] = row[f"s__{a}__{y}"]
            for j, b in enumerate(cols, start=1):
                if j < i:
                    continue
                key = f"s__{a}__{b}" if f"s__{a}__{b}" in row else f"s__{b}__{a}"
                xtx[i, j] = xtx[j, i] = row[key]
        return xtx, xty

    selected, stats = [], {}
    for group, row in rows:
        n = row["n"]
        syy = row["syy"]
        xtx_r, xty_r = _gram(row, yl)
        beta_r = np.linalg.lstsq(xtx_r, xty_r, rcond=None)[0]
        rss_r = max(syy - float(beta_r @ xty_r), 0.0)
        for c in group:
            xl = [f"__{c}_l{k}" for k in range(1, L + 1)]
            xtx_u, xty_u = _gram(row, yl + xl)
            beta_u = np.linalg.lstsq(xtx_u, xty_u, rcond=None)[0]
            rss_u = max(syy - float(beta_u @ xty_u), 0.0)
            dof = n - (2 * L + 1)
            if dof <= 0 or rss_u <= 0.0:
                f_stat, p = float("inf"), 0.0
            else:
                f_stat = ((rss_r - rss_u) / L) / (rss_u / dof)
                f_stat = max(f_stat, 0.0)
                p = f_sf(f_stat, L, dof)
            stats[c] = {"f_stat": f_stat, "p_value": p, "n": int(n)}
            if p < significance_level:
                selected.append(c)
    return (selected, stats) if return_stats else selected
