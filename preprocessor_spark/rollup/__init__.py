from preprocessor_spark.rollup.tiers import RollupTree, TierSpec  # noqa: F401
