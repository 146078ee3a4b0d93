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

# ONE kernel for batch and stream: any fix (e.g. the β-derived block size
# that keeps β^-t finite for α ≳ 0.9) lands in both paths at once
from preprocessor_spark.operators.unbiaser import ewm_carry_sums


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
        # pdfs is an iterator of ARBITRARILY-SPLIT Arrow chunks of this
        # group's micro-batch, with no inter-chunk ordering guarantee —
        # sorting each chunk independently and folding the carry across
        # them would splice later timestamps before earlier ones whenever
        # a batch spans >1 chunk. Materialize and sort the batch ONCE
        # (a group's micro-batch must fit in memory for any per-group sort
        # anyway — the same bound applyInPandas carries).
        chunks = list(pdfs)
        # pd.concat([]) raises — an empty invocation (state-timeout firing,
        # zero-chunk batch) must take the state-preserving branch below,
        # not kill the query
        whole = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame(columns=[series_col, id_col, time_col, value_col])
        )
        if len(whole):
            whole = whole.sort_values([time_col, id_col])
            x = whole[value_col].to_numpy(np.float64)
            mask = ~np.isnan(x)
            num, den = ewm_carry_sums(x, mask, beta, num_c, den_c)
            with np.errstate(invalid="ignore", divide="ignore"):
                ema = num / den
            out = pd.DataFrame(
                {
                    series_col: key[0],
                    id_col: whole[id_col].to_numpy(),
                    time_col: whole[time_col].to_numpy(),
                    "residual": x - ema,
                }
            )
            num_c, den_c = float(num[-1]), float(den[-1])
            n_seen += len(x)
            state.update((num_c, den_c, n_seen))
            yield out
        else:
            state.update((num_c, den_c, n_seen))

    sel = stream.select(series_col, id_col, time_col, value_col)
    return sel.groupBy(series_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
