"""PreprocessorCore facade — the programmatic API (reference EP3,
app/core/preprocessor_core.py:64-216) re-expressed over one labeled
distributed DataFrame.

Lifecycle parity:
  * initialize(config)                 ≈ :32-116 (wiring + config merge)
  * load_data(path)                    ≈ :327-355 (S2 scan + validation)
  * process_data()                     ≈ :714-755 — Stage A feature
    engineering → Stage B split → Stage C normalize (train-only fit,
    skip-if-loaded) → Stage D postprocessing
  * export_results(dir, fmt)           ≈ :757-789 (S4/S5/S6 sinks)
  * get_processing_status/history      ≈ :184-216 (here: stage metrics)

Differences by design (SURVEY §1.5): the "dict of six DataFrames" is a
single DataFrame with a split_id column; processing history is the
pipeline's metrics list plus the durable checkpoint manifest.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from preprocessor_spark.operators.normalizer import Normalizer, numeric_columns
from preprocessor_spark.operators.splitter import DEFAULT_RATIOS, TemporalSplitter
from preprocessor_spark.params import StageParams, load_params, save_params
from preprocessor_spark.pipeline import Pipeline
from preprocessor_spark.sources.io import load_data, write_split_datasets

DEFAULT_CONFIG: dict[str, Any] = {
    "split_ratios": DEFAULT_RATIOS,
    "time_col": "ts",
    "tiebreak_cols": [],
    "split_method": "temporal",
    "seed": 42,
    "normalization_method": "zscore",
    "normalization_columns": None,
    "exclude_features": [],
    "training_datasets": ["d1", "d2"],
    "min_rows": 1,
    # load-time validation gates (reference data_handler.py:83-92,492-539);
    # keys merge over metadata.DEFAULT_VALIDATION_RULES. None disables the
    # data-pass checks entirely (schema-only), {} applies the defaults.
    "validation_rules": {},
    # reference load_data records validation errors and still returns the
    # data (data_handler.py:157-166); only the min_rows floor is fatal by
    # default. strict_validation=True raises on ANY rule violation.
    "strict_validation": False,
    # opt-in FE-stage output contracts (row preservation + column superset,
    # reference feature_engineering_plugin_base.py:227-266) — eager checks,
    # meant for validation runs
    "enforce_stage_contracts": False,
    "output_format": "parquet",
}


@dataclass
class PreprocessorCore:
    spark: SparkSession
    config: dict[str, Any] = field(default_factory=dict)
    feature_stages: list[Callable[[DataFrame], DataFrame]] = field(
        default_factory=list
    )
    post_stages: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)

    def __post_init__(self):
        merged = dict(DEFAULT_CONFIG)
        merged.update(self.config)
        self.config = merged
        self._data: DataFrame | None = None
        self._labeled: DataFrame | None = None
        self._norm_params: StageParams | None = None
        self._norm_params_user_loaded = False
        self._pipeline = Pipeline(
            isolate_failures=True,
            enforce_contracts=bool(self.config.get("enforce_stage_contracts")),
        )
        self._status = "initialized"

    # -- load -------------------------------------------------------------
    def load(self, path_or_df: str | DataFrame, **kw) -> "PreprocessorCore":
        df = (
            path_or_df
            if isinstance(path_or_df, DataFrame)
            else load_data(self.spark, path_or_df, **kw)
        )
        # full rule-set validation (one aggregate pass, see
        # metadata.validate_dataset); config min_rows remains the floor
        # unless the rules override it
        from preprocessor_spark.operators.metadata import validate_dataset

        vr = self.config.get("validation_rules", {})
        if vr is None:  # explicitly disabled: min_rows floor only
            n = df.count()
            self.validation_errors = (
                [f"Insufficient rows: {n} < {self.config['min_rows']}"]
                if n < self.config["min_rows"]
                else []
            )
        else:
            rules = {"min_rows": self.config["min_rows"]}
            rules.update(vr)
            self.validation_errors = validate_dataset(df, rules)
        self.validation_status = "valid" if not self.validation_errors else "invalid"
        fatal = (
            self.validation_errors
            if self.config.get("strict_validation")
            else [e for e in self.validation_errors if e.startswith("Insufficient rows")]
        )
        if fatal:
            raise ValueError("data validation failed: " + "; ".join(fatal))
        self._data = df
        self._status = "loaded"
        # fresh data invalidates params FITTED from previous data (else a
        # second load+process would silently normalize the new table with
        # the old table's means/stds); explicitly USER-LOADED params are
        # a deliberate choice and survive reloads
        if not self._norm_params_user_loaded:
            self._norm_params = None
        return self

    def load_normalization_params(self, path: str) -> "PreprocessorCore":
        """Pre-loaded params skip the fit (reference :456-466)."""
        self._norm_params = load_params(path)
        self._norm_params_user_loaded = True
        return self

    # -- process ----------------------------------------------------------
    def process(self) -> DataFrame:
        if self._data is None:
            raise RuntimeError("call load() first")
        df = self._data

        # Stage A: feature engineering fold (validate row-preservation
        # contract like feature_engineering_plugin_base.py:227-266)
        self._pipeline.stages = list(self.feature_stages)
        df = self._pipeline.run(df)

        # Stage B: six-way split labels
        splitter = TemporalSplitter(
            ratios=self.config["split_ratios"],
            time_col=self.config["time_col"],
            tiebreak_cols=self.config["tiebreak_cols"],
            shuffle=self.config.get("split_method") == "shuffle",
            seed=self.config.get("seed", 42),
        )
        labeled = splitter.transform(df)
        self._splitter = splitter

        # Stage C: normalize — fit on training splits only, unless loaded
        cols = self.config["normalization_columns"] or [
            c
            for c in numeric_columns(labeled, self.config["exclude_features"])
            if c != self.config["time_col"]
        ]
        if self.config["normalization_method"] == "none":
            # CLI-advertised passthrough: no fit, no transform, no params
            pass
        else:
            norm = Normalizer(
                method=self.config["normalization_method"], columns=cols
            )
            if self._norm_params is None:
                train = labeled.filter(
                    F.col("split_id").isin(self.config["training_datasets"])
                )
                self._norm_params = norm.fit(train)
            labeled = norm.transform(labeled, self._norm_params)

        # Stage D: postprocessing fold
        post = Pipeline(
            isolate_failures=True,
            enforce_contracts=self._pipeline.enforce_contracts,
            metrics=self._pipeline.metrics,
        )
        post.stages = list(self.post_stages)
        labeled = post.run(labeled)

        self._labeled = labeled
        self._status = "processed"
        return labeled

    # -- export -----------------------------------------------------------
    def export(self, out_dir: str, fmt: str | None = None) -> None:
        if self._labeled is None:
            raise RuntimeError("call process() first")
        fmt = fmt or self.config["output_format"]
        write_split_datasets(self._labeled, os.path.join(out_dir, "splits"), fmt)
        # method 'none' never applies a transform, even when params were
        # load_normalization_params()-ed in: exporting them would publish a
        # params artifact implying a normalization the splits never got
        if (
            self._norm_params is not None
            and self.config["normalization_method"] != "none"
        ):
            save_params(
                os.path.join(out_dir, "norm_params.json"), self._norm_params
            )
        save_params(
            os.path.join(out_dir, "split_params.json"),
            self._splitter.params(self._labeled),
        )

    # -- introspection ------------------------------------------------------
    def get_processing_status(self) -> dict[str, Any]:
        return {
            "status": self._status,
            "stages_run": len(self._pipeline.metrics),
            "normalization_fitted": self._norm_params is not None,
        }

    def get_processing_history(self) -> list[dict[str, Any]]:
        return [vars(m) for m in self._pipeline.metrics]
