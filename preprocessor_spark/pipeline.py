"""Stage protocol + pipeline runner.

The reference's extension surface is whole-table plugins (``process(df) -> df``,
reference: app/plugins/plugin_normalizer.py:12-38) executed sequentially with
per-plugin timing and failure isolation
(app/core/feature_engineering_plugin_base.py:286-376). Here a stage is a
``DataFrame -> DataFrame`` transformation object; fitted stages expose
``fit(df) -> StageParams`` and ``transform(df, params) -> DataFrame``.

Because Spark is lazy, "per-stage timing" of transformations alone is
meaningless — the runner therefore records plan-build time and, optionally,
a materialization metric per stage when ``eager=True`` (test/debug only;
production pipelines stay one fused lazy DAG so Catalyst pipelines all
stages into as few shuffles as possible).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Protocol, runtime_checkable

from pyspark.sql import DataFrame

from preprocessor_spark.params import StageParams


@runtime_checkable
class Stage(Protocol):
    name: str

    def transform(self, df: DataFrame) -> DataFrame: ...


@runtime_checkable
class FittedStage(Protocol):
    name: str

    def fit(self, df: DataFrame) -> StageParams: ...

    def transform(self, df: DataFrame, params: StageParams) -> DataFrame: ...


@dataclass
class StageMetric:
    stage: str
    plan_seconds: float
    rows: int | None = None
    exec_seconds: float | None = None
    error: str | None = None


@dataclass
class Pipeline:
    """Sequential fold of stages over one DataFrame.

    ``isolate_failures`` mirrors the reference's continue-on-error pipeline
    contract (app/core/feature_engineering_plugin_base.py:345-356): a failing
    stage is skipped (its input passes through) and recorded in metrics.

    ``enforce_contracts`` mirrors the reference's FE-plugin output contract
    (_validate_output, feature_engineering_plugin_base.py:227-266): every
    stage must preserve the row count and emit a column SUPERSET of its
    input. The column check is schema-only (free); the row check counts the
    stage output (eager — use in tests/validation runs, not in the fused
    production DAG). A violating stage is treated exactly like a failing
    one: raised, or skipped-and-recorded under ``isolate_failures``.
    """

    stages: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)
    isolate_failures: bool = False
    enforce_contracts: bool = False
    metrics: list[StageMetric] = field(default_factory=list)

    def add(self, stage) -> "Pipeline":
        self.stages.append(stage)
        return self

    def run(self, df: DataFrame, eager: bool = False) -> DataFrame:
        out = df
        prev_rows: int | None = None  # last counted output = next input
        for st in self.stages:
            name = getattr(st, "name", getattr(st, "__name__", type(st).__name__))
            t0 = time.perf_counter()
            try:
                nxt = st.transform(out) if hasattr(st, "transform") else st(out)
                if self.enforce_contracts:
                    if not isinstance(nxt, DataFrame):
                        raise TypeError(
                            f"stage {name} returned {type(nxt).__name__}, "
                            "not a DataFrame"
                        )
                    dropped = set(out.columns) - set(nxt.columns)
                    if dropped:
                        raise ValueError(
                            f"stage {name} violated the column-superset "
                            f"contract: dropped {sorted(dropped)}"
                        )
                m = StageMetric(stage=name, plan_seconds=time.perf_counter() - t0)
                if eager or self.enforce_contracts:
                    t1 = time.perf_counter()
                    # stage i's input IS stage i-1's counted output: reuse
                    # that number instead of re-executing the whole
                    # accumulated lazy plan with a second count() per stage
                    # (the waste is superlinear in pipeline depth)
                    if self.enforce_contracts:
                        n_in = prev_rows if prev_rows is not None else out.count()
                    else:
                        n_in = None
                    m.rows = nxt.count()
                    m.exec_seconds = time.perf_counter() - t1
                    if self.enforce_contracts and m.rows != n_in:
                        raise ValueError(
                            f"stage {name} violated the row-preservation "
                            f"contract: {n_in} rows in, {m.rows} out"
                        )
                    prev_rows = m.rows
                out = nxt
            except Exception as e:  # noqa: BLE001
                if not self.isolate_failures:
                    raise
                m = StageMetric(
                    stage=name,
                    plan_seconds=time.perf_counter() - t0,
                    error=f"{type(e).__name__}: {e}",
                )
            self.metrics.append(m)
        return out
