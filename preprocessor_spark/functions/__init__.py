from preprocessor_spark.functions import (  # noqa: F401
    decontam,
    dedup,
    media_codecs,
    multimodal,
    similarity,
    text,
    tokens,
)
