"""Multimodal columns — image/audio/video payloads as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The Spark-side plumbing (schemas, batch iteration, partitioning by modality,
output contracts) is real and tested; the actual media decoding is STUBBED —
this container ships no image/audio libraries — behind
``decode_backend='fake'`` (deterministic synthetic features, used by tests)
or ``decode_backend='real'`` which raises NotImplementedError with the
intended library call documented.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16


def synth_media(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes, metadata
    consistent per modality. Same hash-derived determinism as synth.py."""
    df = spark.range(n_rows)
    h = F.abs(F.xxhash64(F.lit(seed), "id"))
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (h % 3 + 1).cast("int")
    )
    return df.select(
        F.format_string("m-%09d", "id").alias("media_id"),
        modality.alias("modality"),
        F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        F.concat(F.lit("application/x-fake-"), modality).alias("mime"),
        F.when(modality == "image", (h % 1920 + 1).cast("int")).alias("width"),
        F.when(modality == "image", (h % 1080 + 1).cast("int")).alias("height"),
        F.when(modality != "image", (h % 60000 + 1).cast("int")).alias("duration_ms"),
    )


def _fake_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in for a decoder+featurizer: sha256 of the payload
    expanded to FEATURE_DIM floats in [0, 1). Vectorized per Arrow batch."""
    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, p in enumerate(payloads):
        d = hashlib.sha256(bytes(p) if p is not None else b"").digest()
        out[i] = np.frombuffer(d[: FEATURE_DIM * 2], dtype=np.uint16) / 65536.0
    return out


def extract_features(
    df: DataFrame, decode_backend: str = "fake", batch_hint: int = 1024
) -> DataFrame:
    """mapInPandas featurization: (media_id, modality, features:array<float>).

    With a real backend this is where PIL/torchaudio/pyav decode each
    payload inside the Arrow batch; the Spark-side contract (schema, batch
    shape, null payloads → null features) is identical."""
    if decode_backend == "real":
        raise NotImplementedError(
            "real media decoding needs PIL/torchaudio/pyav, not present in "
            "this container; wire the decoder into _fake_features's slot"
        )
    if decode_backend != "fake":
        raise ValueError(f"unknown decode_backend: {decode_backend}")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("modality", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def featurize(iterator):
        for pdf in iterator:
            feats = _fake_features(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": [row.tolist() for row in feats],
                }
            )

    return df.mapInPandas(featurize, out_schema)


def resize_images(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Image resize stage: metadata math is real (native expressions compute
    the target box preserving aspect ratio); pixel resampling is the stubbed
    decoder's job — payload passes through unchanged under the fake backend."""
    scale = F.least(
        F.lit(max_side) / F.greatest(F.col("width"), F.lit(1)),
        F.lit(max_side) / F.greatest(F.col("height"), F.lit(1)),
        F.lit(1.0),
    )
    return df.withColumn(
        "target_width", F.ceil(F.col("width") * scale).cast("int")
    ).withColumn("target_height", F.ceil(F.col("height") * scale).cast("int"))


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode one row per sampled frame
    timestamp (native sequence/explode — the real decoder would seek these
    offsets). Non-video rows pass through with frame_ms = null."""
    frames = F.when(
        (F.col("modality") == "video") & F.col("duration_ms").isNotNull(),
        F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)),
    ).otherwise(F.array(F.lit(None).cast("int")))
    return df.withColumn("frame_ms", F.explode(frames))
