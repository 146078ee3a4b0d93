"""Cleaner — outlier masking/filtering, gap-fill against a dense time spine,
and linear interpolation of missing values.

Reference semantics (app/plugins/plugin_cleaner.py):
  * outlier handling (``:123-135``): per column, mask ``|x − mean| > k·std``
    → NaN (method 'interpolate') or drop the rows (method 'drop');
  * gap-fill (``:83-101``): build the dense ``date_range(min, max, freq=p
    minutes)``, find missing stamps, insert empty rows, sort;
  * interpolation (``:101``, ``:140``): pandas ``interpolate(method='linear')``
    — linear in ROW POSITION between the nearest non-null neighbours.

Spark mapping (SURVEY §2.2 P6/P7, §2.5 W3):
  * outliers: one agg pass for (mean, std) per column → literal-injected
    mask/filter (two scans total, both codegen'd);
  * dense spine: ``sequence(min(ts), max(ts), interval p minutes)`` exploded
    per series, LEFT JOIN facts on (series, ts). The spine is generated
    from a 1-row-per-series aggregate, so the join is broadcast-able and
    the fill adds a single small shuffle;
  * linear interpolation: native window algebra — last/first non-null via
    ``last(v, ignorenulls)`` over unbounded fwd/bwd windows plus row-gap
    fraction arithmetic. No Python; exactly pandas' default
    (row-positional) linear interpolation with no extrapolation at the
    edges (leading/trailing nulls stay null, matching
    ``interpolate(method='linear')`` defaults for leading NaNs; trailing
    NaNs are forward-filled by pandas — controlled by ``limit_direction``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from preprocessor_spark.operators.normalizer import numeric_columns


class Cleaner:
    name = "cleaner"

    def __init__(
        self,
        method: str = "interpolate",  # 'interpolate' | 'drop'
        outlier_threshold: float = 3.0,
        period_minutes: int | None = None,
        time_col: str = "ts",
        series_cols: list[str] | None = None,
        value_cols: list[str] | None = None,
        tiebreak_cols: list[str] | None = None,
    ):
        self.method = method
        self.k = outlier_threshold
        self.period_minutes = period_minutes
        self.time_col = time_col
        self.series_cols = series_cols or []
        self.value_cols = value_cols
        # duplicate timestamps within a series make the interpolation
        # window's row order — and so which neighbor a null bridges from —
        # partition-order-dependent without an explicit tiebreak
        self.tiebreak_cols = tiebreak_cols or []

    def _values(self, df: DataFrame) -> list[str]:
        return self.value_cols or [
            c
            for c in numeric_columns(df)
            if c != self.time_col and c not in self.series_cols
        ]

    # -- outliers ----------------------------------------------------------
    def _fit_outlier_stats(self, df: DataFrame, vals: list[str]):
        """One (mean, sample-std) aggregate shared by mask and drop — the
        two variants must apply the SAME outlier definition."""
        return df.agg(
            *[F.mean(c).alias(f"{c}__m") for c in vals],
            *[F.stddev_samp(c).alias(f"{c}__s") for c in vals],
        ).collect()[0]

    def mask_outliers(self, df: DataFrame) -> DataFrame:
        """|x − mean| > k·std → NULL (reference plugin_cleaner.py:128,135)."""
        vals = self._values(df)
        stats = self._fit_outlier_stats(df, vals)
        out = df
        for c in vals:
            m, s = stats[f"{c}__m"], stats[f"{c}__s"]
            if m is None or s is None:
                continue
            out = out.withColumn(
                c,
                F.when(
                    F.abs(F.col(c) - F.lit(m)) > F.lit(self.k) * F.lit(s), F.lit(None)
                ).otherwise(F.col(c)),
            )
        return out

    def drop_outliers(self, df: DataFrame) -> DataFrame:
        """Filter rows outside k·std on any value column (P6)."""
        vals = self._values(df)
        stats = self._fit_outlier_stats(df, vals)
        cond = F.lit(True)
        for c in vals:
            m, s = stats[f"{c}__m"], stats[f"{c}__s"]
            if m is None or s is None:
                continue
            cond = cond & (
                F.col(c).isNull()
                | (F.abs(F.col(c) - F.lit(m)) <= F.lit(self.k) * F.lit(s))
            )
        return df.filter(cond)

    # -- gap fill ----------------------------------------------------------
    def gap_fill(self, df: DataFrame) -> DataFrame:
        """FULL OUTER JOIN facts with the dense per-series minute spine;
        missing stamps appear as all-null value rows (reference
        plugin_cleaner.py:91-100, which INSERTS stamps into the existing
        frame). Full — not left — outer: a left join from the spine would
        silently DROP any fact whose timestamp is off the min(ts)+k·period
        grid, and interpolation would then bridge the hole as if the
        observation never existed."""
        if not self.period_minutes:
            raise ValueError("gap_fill requires period_minutes")
        spine = dense_spine(
            df, self.time_col, self.period_minutes, self.series_cols
        )
        join_keys = [*self.series_cols, self.time_col]
        return spine.join(df, on=join_keys, how="full")

    # -- interpolation -----------------------------------------------------
    def interpolate(self, df: DataFrame) -> DataFrame:
        return interpolate_linear(
            df,
            self._values(df),
            self.time_col,
            self.series_cols,
            tiebreak_cols=self.tiebreak_cols,
        )

    def transform(self, df: DataFrame) -> DataFrame:
        """Full cleaner pass: mask outliers → gap-fill (if period set) →
        interpolate, or drop-rows variant (reference plugin_cleaner.py:123-140)."""
        if self.method == "drop":
            out = self.drop_outliers(df)
            return out.na.drop(subset=self._values(df))
        out = self.mask_outliers(df)
        if self.period_minutes:
            out = self.gap_fill(out)
        return self.interpolate(out)


def dense_spine(
    df: DataFrame,
    time_col: str,
    period_minutes: int | None,
    series_cols: list[str],
    period_seconds: int | None = None,
) -> DataFrame:
    """One row per (series, expected timestamp): explode
    sequence(min(ts), max(ts), period). The pre-explode aggregate is one row
    per series, so this never shuffles the fact table. ``period_seconds``
    takes precedence when given (sub-minute tiers)."""
    if period_seconds is None:
        period_seconds = int(period_minutes) * 60
    bounds = df.groupBy(*series_cols).agg(
        F.min(time_col).alias("__t0"), F.max(time_col).alias("__t1")
    )
    return bounds.select(
        *series_cols,
        F.explode(
            F.sequence(
                F.col("__t0"),
                F.col("__t1"),
                F.expr(f"INTERVAL {int(period_seconds)} SECOND"),
            )
        ).alias(time_col),
    )


def interpolate_linear(
    df: DataFrame,
    value_cols: list[str],
    time_col: str,
    series_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Row-positional linear interpolation, pandas-equivalent, pure window
    algebra: for a null at position i between last non-null (pos p, val a)
    and next non-null (pos n, val b): a + (b−a)·(i−p)/(n−p).

    pandas ``interpolate(method='linear')`` default also forward-fills
    trailing nulls (limit_direction='forward'); we replicate that; leading
    nulls remain null (same as pandas).
    """
    series_cols = series_cols or []
    order = [time_col, *(tiebreak_cols or [])]
    w_ord = Window.partitionBy(*series_cols).orderBy(*order)
    w_bwd = w_ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    w_fwd_all = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    out = df.withColumn("__pos", F.row_number().over(w_ord))
    for c in value_cols:
        prev_val = F.last(c, ignorenulls=True).over(w_fwd_all)
        prev_pos = F.last(
            F.when(F.col(c).isNotNull(), F.col("__pos")), ignorenulls=True
        ).over(w_fwd_all)
        next_val = F.first(c, ignorenulls=True).over(w_bwd)
        next_pos = F.first(
            F.when(F.col(c).isNotNull(), F.col("__pos")), ignorenulls=True
        ).over(w_bwd)
        interp = prev_val + (next_val - prev_val) * (
            (F.col("__pos") - prev_pos) / (next_pos - prev_pos)
        )
        out = out.withColumn(
            c,
            F.when(F.col(c).isNotNull(), F.col(c))
            .when(next_pos.isNull(), prev_val)  # trailing: ffill like pandas
            .when(prev_pos.isNull(), F.lit(None))  # leading: stay null
            .otherwise(interp),
        )
    return out.drop("__pos")
