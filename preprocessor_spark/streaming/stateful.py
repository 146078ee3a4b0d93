"""Custom stateful streaming operator: incremental EMA via
``applyInPandasWithState``.

The batch EMA (operators/unbiaser.py) is a ratio of two exponential sums
num_t/den_t, each satisfying s_t = local_t + β^{n} · s_prev across batch
boundaries — so per-series streaming state is just the (num, den, count)
triple after the last processed row. Each micro-batch folds its rows into
the carried state with the same numpy kernel the batch chunked path uses,
emitting the residual (x − EMA) per row.

Contract: rows must arrive time-ordered per series across micro-batches
(true for append-only time-partitioned sources); within a batch they are
sorted. The operator is exactly the chunked-carry batch EMA with chunks ==
micro-batches, so a drained stream equals the batch result to float
round-off (verified in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _ewm_sums(x, mask, beta, cin_num, cin_den):
    """Carry-in exponential sums, bounded-block vectorized (same algebra as
    Unbiaser._ema_chunked)."""
    n = len(x)
    num = np.empty(n)
    den = np.empty(n)
    cn, cd = cin_num, cin_den
    B = 256
    for s in range(0, n, B):
        e = min(s + B, n)
        t = np.arange(e - s, dtype=np.float64)
        m = mask[s:e]
        xz = np.where(m, x[s:e], 0.0)
        inv = beta ** -t
        scale = beta ** t
        num[s:e] = np.cumsum(xz * inv) * scale + (beta ** (t + 1)) * cn
        den[s:e] = (
            np.cumsum(m.astype(np.float64) * inv) * scale + (beta ** (t + 1)) * cd
        )
        cn, cd = num[e - 1], den[e - 1]
    return num, den


def stream_ema_unbias(
    stream: DataFrame,
    value_col: str = "n_tok",
    series_col: str = "source",
    time_col: str = "ts",
    id_col: str = "doc_id",
    alpha: float = 0.1,
) -> DataFrame:
    """Streaming W2: per-series EMA residuals with carried state."""
    beta = 1.0 - alpha
    out_schema = T.StructType(
        [
            T.StructField(series_col, T.StringType()),
            T.StructField(id_col, T.StringType()),
            T.StructField(time_col, T.TimestampType()),
            T.StructField("residual", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("num", T.DoubleType()),
            T.StructField("den", T.DoubleType()),
            T.StructField("n_seen", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        num_c, den_c = 0.0, 0.0
        n_seen = 0
        if state.exists:
            num_c, den_c, n_seen = state.get
        frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values([time_col, id_col])
            x = pdf[value_col].to_numpy(np.float64)
            mask = ~np.isnan(x)
            num, den = _ewm_sums(x, mask, beta, num_c, den_c)
            with np.errstate(invalid="ignore", divide="ignore"):
                ema = num / den
            frames.append(
                pd.DataFrame(
                    {
                        series_col: key[0],
                        id_col: pdf[id_col].to_numpy(),
                        time_col: pdf[time_col].to_numpy(),
                        "residual": x - ema,
                    }
                )
            )
            if len(x):
                num_c, den_c = float(num[-1]), float(den[-1])
                n_seen += len(x)
        state.update((num_c, den_c, n_seen))
        yield from frames

    sel = stream.select(series_col, id_col, time_col, value_col)
    return sel.groupBy(series_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
