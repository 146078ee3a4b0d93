from preprocessor_spark.functions import dedup, similarity, text, tokens  # noqa: F401
