"""Unbiaser — moving-average and EMA detrending of time-ordered series.

Reference semantics (app/plugins/plugin_unbiaser.py):
  * MA  (``:89-110``): ``out[i] = x[i] − mean(x[max(0, i−w+1) .. i])`` — a
    trailing window of size ``w`` INCLUDING the current row, with partial
    windows at the series head. The reference runs an O(n·w) Python loop;
    here it is one native window expression
    ``avg(c) OVER (PARTITION BY series ORDER BY t ROWS BETWEEN w-1 PRECEDING
    AND CURRENT ROW)`` — exact match including partial leading windows,
    fully codegen'd, no Python.
  * EMA (``:112-129``): ``out = x − x.ewm(alpha=α, adjust=True).mean()``.
    The adjust=True recurrence has no native Spark expression, and partial
    finite-window approximations are not bit-exact — so the EMA runs pandas'
    own ``ewm`` inside an Arrow-vectorized ``applyInPandas`` per series
    group (no per-row Python; bit-for-bit equal to the reference).

Scale notes: MA is a single shuffle on the series key (sort within
partition). EMA is inherently sequential per series — one task per series
key, which parallelizes across the (many) sources of the corpus; for a
single huge series, chunk-and-carry state would be needed (documented
limitation, SURVEY §7 risk 3).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class Unbiaser:
    name = "unbiaser"

    def __init__(
        self,
        method: str = "ma",
        window_size: int = 5,
        ema_alpha: float = 0.1,
        time_col: str = "ts",
        series_cols: list[str] | None = None,
        value_cols: list[str] | None = None,
        tiebreak_cols: list[str] | None = None,
        chunk_rows: int | None = None,
    ):
        if method not in {"ma", "ema"}:
            raise ValueError(f"unknown unbias method: {method}")
        self.method = method
        self.window_size = window_size
        self.ema_alpha = ema_alpha
        self.time_col = time_col
        self.series_cols = series_cols or []
        self.value_cols = value_cols
        self.tiebreak_cols = tiebreak_cols or []
        # MA scale path: split each series into chunk_rows-row chunks with
        # w-1 overlap so window parallelism is series x chunks (exact)
        self.chunk_rows = chunk_rows

    def _values(self, df: DataFrame) -> list[str]:
        if self.value_cols:
            return self.value_cols
        skip = set(self.series_cols) | {self.time_col} | set(self.tiebreak_cols)
        return [
            c
            for c, t in df.dtypes
            if c not in skip and t in ("double", "float", "int", "bigint")
        ]

    def transform(self, df: DataFrame) -> DataFrame:
        if self.method == "ma":
            if self.chunk_rows:
                return self._ma_chunked(df)
            return self._ma(df)
        return self._ema(df)

    def _ma(self, df: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy(*self.series_cols)
            .orderBy(self.time_col, *self.tiebreak_cols)
            .rowsBetween(-(self.window_size - 1), 0)
        )
        out = df
        for c in self._values(df):
            out = out.withColumn(c, F.col(c) - F.avg(c).over(w))
        return out

    def _ma_chunked(self, df: DataFrame) -> DataFrame:
        """Scale path for W1: identical output to :meth:`_ma`, but the window
        runs per (series, chunk) so parallelism = series × chunks instead of
        being capped at |series| (a per-source window serializes each source
        into one task — the bottleneck at corpus scale).

        Method: dense per-series positions (grouped_positions), chunk =
        pos // chunk_rows; the last w−1 rows of every chunk are ALSO fed to
        the next chunk (flagged), so each chunk head sees its true trailing
        window; flagged rows are dropped after the window. Dense positions
        make this exact across time gaps — time-based chunking would break
        the row-window semantics at gaps."""
        from preprocessor_spark.operators.positions import grouped_positions

        w_size = self.window_size
        vals = self._values(df)
        pos = grouped_positions(
            df,
            [self.time_col, *self.tiebreak_cols],
            group_cols=self.series_cols,
            pos_col="__pos",
        )
        chunk = (F.col("__pos") / self.chunk_rows).cast("long")
        cur = pos.withColumn("__chunk", chunk).withColumn("__aug", F.lit(False))
        tails = (
            cur.filter(
                F.col("__pos") % self.chunk_rows >= self.chunk_rows - (w_size - 1)
            )
            .withColumn("__chunk", F.col("__chunk") + 1)
            .withColumn("__aug", F.lit(True))
        )
        unioned = cur.unionByName(tails)
        w = (
            Window.partitionBy(*self.series_cols, "__chunk")
            .orderBy("__pos")
            .rowsBetween(-(w_size - 1), 0)
        )
        out = unioned
        for c in vals:
            out = out.withColumn(c, F.col(c) - F.avg(c).over(w))
        return out.filter(~F.col("__aug")).drop("__pos", "__chunk", "__aug")

    def _ema(self, df: DataFrame) -> DataFrame:
        vals = self._values(df)
        alpha = self.ema_alpha
        tcol, tie = self.time_col, self.tiebreak_cols
        schema = df.schema

        def ewm_unbias(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values([tcol, *tie], kind="mergesort")
            for c in vals:
                # pandas ewm(adjust=True) — identical recurrence to the
                # reference (app/plugins/plugin_unbiaser.py:124-125)
                pdf[c] = pdf[c] - pdf[c].ewm(alpha=alpha, adjust=True).mean()
            return pdf

        if self.series_cols:
            return df.groupBy(*self.series_cols).applyInPandas(ewm_unbias, schema)
        # Single global series: one group. Valid only for driver-scale data;
        # callers at scale must provide series_cols.
        return (
            df.withColumn("__g", F.lit(0))
            .groupBy("__g")
            .applyInPandas(
                lambda pdf: ewm_unbias(pdf.drop(columns="__g")), schema
            )
        )
