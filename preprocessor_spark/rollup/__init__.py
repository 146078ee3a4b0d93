from preprocessor_spark.rollup.incremental import (  # noqa: F401
    IncrementalRollup,
    merge_partials,
)
from preprocessor_spark.rollup.tiers import (  # noqa: F401
    RetentionPolicy,
    RollupTree,
    TierSpec,
)
