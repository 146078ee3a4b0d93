"""Trimmer — drop columns by index/name and rows by position or time range.

Reference semantics (app/plugins/plugin_trimmer.py:25-45): params
``{columns: [idx...], rows: [idx...]}``; columns dropped positionally
(``:41``), rows dropped by integer index (``:45``).

Spark mapping (SURVEY §2.2 P2/P3):
  * column drops are pure projection — Catalyst prunes them out of the
    Parquet/Iceberg scan entirely (metadata-only at any scale);
  * positional row drops need a global order: ``row_number() OVER
    (ORDER BY time)``. For small drop-lists we filter with ``~isin``;
    for large ones, a broadcast anti-join against a drop-list DataFrame.
    Pass ``tiebreak_cols`` when the order column can carry duplicates —
    tied rows otherwise take scheduler-dependent positions and reruns can
    drop a DIFFERENT physical row (the reference rides pandas row order,
    which Spark does not have).
  * ``drop_time_range`` is the scale path: time-range trims become
    partition-pruning predicates on the time-partitioned table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from preprocessor_spark.params import StageParams


class Trimmer:
    name = "trimmer"

    def __init__(
        self,
        columns: list[int] | None = None,
        rows: list[int] | None = None,
        column_names: list[str] | None = None,
        order_col: str = "ts",
        tiebreak_cols: list[str] | None = None,
    ):
        self.columns = columns or []
        self.rows = rows or []
        self.column_names = column_names or []
        self.order_col = order_col
        self.tiebreak_cols = tiebreak_cols or []

    def params(self) -> StageParams:
        # the full configuration, not just the positional lists: a lineage
        # consumer of the saved record must be able to reproduce/explain a
        # name-keyed column drop and the row-drop ordering
        return StageParams(
            stage=self.name,
            method="positional",
            params={
                "columns": self.columns,
                "rows": self.rows,
                "column_names": self.column_names,
                "order_col": self.order_col,
                "tiebreak_cols": self.tiebreak_cols,
            },
        )

    def transform(self, df: DataFrame) -> DataFrame:
        # row drops FIRST, on the frame that still carries the order (and
        # tiebreak) columns: one call configured to drop BOTH the time
        # column and rows used to compute positions on the post-drop frame
        # and die on the missing order key. Which rows drop is unaffected —
        # positions are row-wise, independent of column projection (pandas
        # iloc semantics).
        out = df
        if self.rows:
            from preprocessor_spark.operators.positions import (
                is_bucketable_dtype,
            )

            order_dtype = dict(df.dtypes).get(self.order_col, "")
            if is_bucketable_dtype(order_dtype):
                # scale path: distributed 0-based positions (value-bucketed
                # two-pass, see operators/positions.py) — no single-partition
                # window even on a 10^9-row table
                from preprocessor_spark.operators.positions import (
                    grouped_positions,
                )

                positioned = grouped_positions(
                    out, [self.order_col, *self.tiebreak_cols], pos_col="__rn"
                )
                # reference row indices are 0-based (pandas iloc), as is __pos
                out = positioned.filter(
                    ~F.col("__rn").isin(list(self.rows))
                ).drop("__rn")
            else:
                # non-bucketable order key (e.g. string ids): legacy-shape
                # fallback, single ordered window — fine at the small sizes
                # this positional API targets; time-keyed tables take the
                # branch above
                w = Window.orderBy(self.order_col, *self.tiebreak_cols)
                targets = [r + 1 for r in self.rows]
                out = (
                    out.withColumn("__rn", F.row_number().over(w))
                    .filter(~F.col("__rn").isin(targets))
                    .drop("__rn")
                )
        drop_names = [df.columns[i] for i in self.columns] + self.column_names
        if drop_names:
            out = out.drop(*drop_names)
        return out

    @staticmethod
    def drop_time_range(df: DataFrame, time_col: str, start, end) -> DataFrame:
        """Scale-path row trim: a time-range predicate that Catalyst pushes to
        the scan and prunes time partitions with (SURVEY §2.2 P3)."""
        return df.filter(~((F.col(time_col) >= start) & (F.col(time_col) < end)))


def require_columns(df: DataFrame, order: list[str], strict: bool = True) -> DataFrame:
    """P4 column reorder + required-column check (reference
    app/plugins/plugin_default.py:107-117): reorder to ``order``, raise on
    missing; non-strict appends the remaining columns after the ordered ones."""
    missing = [c for c in order if c not in df.columns]
    if missing:
        raise ValueError(f"missing required columns: {missing}")
    rest = [] if strict else [c for c in df.columns if c not in order]
    return df.select(*order, *rest)
