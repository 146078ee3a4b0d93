from preprocessor_spark.operators.normalizer import Normalizer  # noqa: F401
from preprocessor_spark.operators.unbiaser import Unbiaser  # noqa: F401
from preprocessor_spark.operators.trimmer import Trimmer  # noqa: F401
from preprocessor_spark.operators.cleaner import Cleaner  # noqa: F401
from preprocessor_spark.operators.splitter import TemporalSplitter  # noqa: F401
from preprocessor_spark.operators.feature_selector import (  # noqa: F401
    FeatureSelector,
    boruta_select,
    granger_select,
    lasso_select,
)
