from preprocessor_spark.functions import (  # noqa: F401
    dedup,
    media_codecs,
    multimodal,
    similarity,
    text,
    tokens,
)
