"""Multimodal columns — image/audio/video payloads as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The decode step is REAL for the formats this container can handle without
media libraries (see functions/media_codecs.py: 24-bit BMP images, 16-bit
PCM WAV audio, concatenated-BMP video) — ``decode_backend='real'`` decodes
payload bytes and computes features from actual pixels/samples/frames.
Formats that need PIL/torchaudio/pyav (JPEG/MP3/MP4 …) plug into the same
seam; ``decode_backend='fake'`` remains as the deterministic hash
featurizer for plumbing tests that don't care about media content.

Scale shape: payloads never pass through Python row-at-a-time — each
mapInPandas batch arrives as one Arrow buffer, and every per-payload kernel
is numpy-vectorized over that payload's pixels/samples. Partition by
modality (or payload-size buckets) upstream so batches are homogeneous and
executor memory is bounded by batch_hint × payload size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from preprocessor_spark.functions import media_codecs as mc

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # encoded media bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16
_AUDIO_RATE = 8000


# ---------------------------------------------------------------- synth
def synth_media(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL encoded payloads: BMP and PNG
    images (alternating, so the compressed zlib-deflate format runs through
    every distributed stage, not just unit tests), PCM WAV audio,
    concatenated-BMP video — each decodable by the real backend. Content
    derives from a per-row seeded RNG so the table is bit-identical at any
    parallelism."""
    base = spark.range(n_rows)

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(i))
                modality = ("image", "audio", "video")[int(i) % 3]
                if modality == "image":
                    w, h = int(rng.integers(8, 64)), int(rng.integers(8, 48))
                    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    if int(i) % 6 == 3:  # every other image: REAL compressed
                        payload, mime = mc.encode_png(arr), "image/png"
                    else:
                        payload, mime = mc.encode_bmp(arr), "image/bmp"
                    width, height, dur = w, h, None
                elif modality == "audio":
                    n = int(rng.integers(_AUDIO_RATE // 4, _AUDIO_RATE))
                    x = (rng.normal(0, 3000, n)).astype(np.int16)
                    payload, mime = mc.encode_wav(x, _AUDIO_RATE), "audio/wav"
                    width = height = None
                    dur = int(n * 1000 / _AUDIO_RATE)
                else:
                    w, h = int(rng.integers(8, 24)), int(rng.integers(8, 16))
                    nf = int(rng.integers(2, 6))
                    frames = [
                        rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                        for _ in range(nf)
                    ]
                    payload = mc.encode_frames(frames)
                    mime = "video/x-bmp-frames"
                    width, height, dur = w, h, nf * 1000
                rows.append(
                    (f"m-{int(i):09d}", modality, payload, mime, width, height, dur)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return base.mapInPandas(gen, MEDIA_SCHEMA)


def synth_media_sql(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table whose every synthesis parameter is a hex
    substring of ``md5(cast(id, string))`` — the engine's oracle-portable
    hash idiom (functions/hashing.py) — so a SQL engine can recompute the
    modality, dimensions, payload byte size, and content level of every row
    WITHOUT decoding anything, while the Spark side carries REAL encoded
    payloads (constant-fill 24-bit BMP / 16-bit PCM WAV / concatenated-BMP
    frames, media_codecs.py). Decoding a payload therefore verifies actual
    content round-trip against pure arithmetic: the driver's multimodal
    CORRECTNESS oracle is built on this.

    Parameter layout over the md5 hex digest ``m`` (DuckDB mirror in
    ``__spark_entry__.oracle_sql()['multimodal_pipeline']``):
      modality  = hex[1:2]  % 3            → image | audio | video
      img w, h  = 8 + hex[3:2] % 56, 8 + hex[5:2] % 40
      fill      = hex[7:2]                 (constant pixel value 0..255)
      n samples = 2000 + hex[9:4] % 6000   (audio, 8 kHz)
      amplitude = hex[13:4] % 20001 − 10000 (constant int16 sample)
      vid w, h  = 8 + hex[3:2] % 16, 8 + hex[5:2] % 8
      n frames  = 2 + hex[17:1] % 4
    """
    m = F.md5(F.col(id_col).cast("string"))

    def hx(start: int, length: int) -> Column:
        return F.conv(F.substring(m, start, length), 16, 10).cast("long")

    mi = (hx(1, 2) % 3).alias("__mi")
    img_w, img_h = hx(3, 2) % 56 + 8, hx(5, 2) % 40 + 8
    vid_w, vid_h = hx(3, 2) % 16 + 8, hx(5, 2) % 8 + 8
    params = df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (mi + 1).cast("int"),
        ).alias("modality"),
        F.when(mi == 0, img_w).when(mi == 2, vid_w).cast("int").alias("width"),
        F.when(mi == 0, img_h).when(mi == 2, vid_h).cast("int").alias("height"),
        (hx(7, 2)).cast("int").alias("fill"),
        (hx(9, 4) % 6000 + 2000).cast("int").alias("n_samples"),
        (hx(13, 4) % 20001 - 10000).cast("int").alias("amp"),
        (hx(17, 1) % 4 + 2).cast("int").alias("nf"),
    )
    # duration: audio = floor(samples·1000/rate); video = frames · 1000 ms
    params = params.withColumn(
        "duration_ms",
        F.when(
            F.col("modality") == "audio",
            F.floor(F.col("n_samples") * 1000 / _AUDIO_RATE),
        )
        .when(F.col("modality") == "video", F.col("nf") * 1000)
        .cast("int"),
    )
    out_schema = MEDIA_SCHEMA  # single definition — synth_media uses it too

    def encode(iterator):
        for pdf in iterator:
            payloads, mimes = [], []
            for mod, w, h, fill, n, amp, nf in zip(
                pdf["modality"], pdf["width"], pdf["height"], pdf["fill"],
                pdf["n_samples"], pdf["amp"], pdf["nf"],
            ):
                if mod == "image":
                    arr = np.full((int(h), int(w), 3), int(fill), dtype=np.uint8)
                    payloads.append(mc.encode_bmp(arr))
                    mimes.append("image/bmp")
                elif mod == "audio":
                    x = np.full(int(n), int(amp), dtype=np.int16)
                    payloads.append(mc.encode_wav(x, _AUDIO_RATE))
                    mimes.append("audio/wav")
                else:
                    frame = np.full((int(h), int(w), 3), int(fill), dtype=np.uint8)
                    payloads.append(mc.encode_frames([frame] * int(nf)))
                    mimes.append("video/x-bmp-frames")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": payloads,
                    "mime": mimes,
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return params.mapInPandas(encode, out_schema)


# ----------------------------------------------------------- featurizers
def _image_features(arr: np.ndarray) -> np.ndarray:
    """16-dim image descriptor: normalized dims, per-channel mean/std,
    8-bin grayscale histogram — all vectorized over the pixel array."""
    h, w = arr.shape[:2]
    px = arr.reshape(-1, 3).astype(np.float64)
    gray = px.mean(axis=1)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 256.0))
    return np.concatenate(
        [
            [w / 4096.0, h / 4096.0],
            px.mean(axis=0) / 255.0,
            px.std(axis=0) / 255.0,
            hist / max(gray.size, 1),
        ]
    ).astype(np.float32)


def _audio_features(rate: int, samples: np.ndarray) -> np.ndarray:
    """16-dim audio descriptor: duration, rms, zero-crossing rate, mean
    |x|, 12 log-spaced rfft band energies."""
    x = samples.astype(np.float64) / 32768.0
    n = max(len(x), 1)
    zcr = float(np.count_nonzero(np.diff(np.signbit(x)))) / n
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    spec = np.abs(np.fft.rfft(x)) if len(x) else np.zeros(1)
    edges = np.unique(
        np.round(np.geomspace(1, max(len(spec) - 1, 1), 13)).astype(int)
    )
    bands = np.zeros(12)
    total = spec.sum() or 1.0
    for b in range(min(12, len(edges) - 1)):
        bands[b] = spec[edges[b] : edges[b + 1]].sum() / total
    return np.concatenate(
        [[n / rate / 60.0, rms, zcr, float(np.mean(np.abs(x))) if len(x) else 0.0],
         bands]
    ).astype(np.float32)


def _real_features(modality: str, payload: bytes) -> np.ndarray:
    # *_any decoders: in-house codecs first (bit-identical behavior when no
    # media libs are installed), then PIL/soundfile if present — real-world
    # JPEG/PNG/FLAC corpora light up automatically (media_codecs.HAVE_PIL /
    # HAVE_SOUNDFILE; tests skip-if-absent)
    if modality == "image":
        return _image_features(mc.decode_image_any(payload))
    if modality == "audio":
        rate, samples = mc.decode_audio_any(payload)
        return _audio_features(rate, samples)
    if modality == "video":
        frames = mc.decode_frames(payload)
        if not frames:
            return np.zeros(FEATURE_DIM, dtype=np.float32)
        return np.mean([_image_features(f) for f in frames], axis=0).astype(
            np.float32
        )
    raise ValueError(f"unknown modality: {modality}")


def _fake_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic hash featurizer (content-blind): sha256 of the payload
    expanded to FEATURE_DIM floats in [0, 1)."""
    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, p in enumerate(payloads):
        d = hashlib.sha256(bytes(p) if p is not None else b"").digest()
        out[i] = np.frombuffer(d[: FEATURE_DIM * 2], dtype=np.uint16) / 65536.0
    return out


def _features_auto(modality: str, payload: bytes) -> tuple[list, str]:
    """'auto' per-row policy: real decode, hash fallback ONLY on the codec's
    not-an-in-house-format signals (``ValueError`` from magic/format checks,
    ``struct.error`` from truncated headers; a truncated PNG IDAT stream's
    ``zlib.error`` is already mapped to ValueError inside
    ``decode_image_any``). Any other exception is a decoder bug and must
    surface, not degrade to content-blind features.
    Returns ``(features, backend_used)``."""
    import struct as _struct

    try:
        return _real_features(modality, payload).tolist(), "real"
    except (ValueError, _struct.error):
        return _fake_features(pd.Series([payload]))[0].tolist(), "fake"


def extract_features(
    df: DataFrame,
    decode_backend: str = "auto",
    batch_hint: int = 1024,
    with_backend_col: bool = False,
) -> DataFrame:
    """mapInPandas featurization: (media_id, modality, features:array<float>).

    ``decode_backend='real'`` decodes BMP/PNG/WAV/frame-container payloads
    (media_codecs.py — PNG via stdlib zlib, no third-party library) and
    featurizes actual pixels/samples; null payloads
    yield null features; undecodable payloads raise. ``'fake'`` is the
    content-blind hash featurizer. ``'auto'`` (default) tries the real
    decoder and falls back to the hash featurizer per row ONLY when the
    payload is not one of the decodable formats (codec ``ValueError`` /
    ``struct.error`` — e.g. real JPEG/MP3 bytes), so a mixed corpus
    never fails mid-job; any other exception (a decoder bug) still raises
    so real defects surface. ``with_backend_col=True`` appends a
    ``feature_backend`` column ('real'/'fake', null payload → null) so
    silent degradation is observable/aggregatable downstream."""
    if decode_backend not in ("real", "fake", "auto"):
        raise ValueError(f"unknown decode_backend: {decode_backend}")
    fields = [
        T.StructField("media_id", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
    if with_backend_col:
        fields.append(T.StructField("feature_backend", T.StringType()))
    out_schema = T.StructType(fields)

    def _one(m, p):
        # returns (features, backend_used)
        if p is None:
            return None, None
        if decode_backend == "real":
            return _real_features(m, bytes(p)).tolist(), "real"
        return _features_auto(m, bytes(p))

    def featurize(iterator):
        for pdf in iterator:
            if decode_backend == "fake":
                # null payloads yield null features on EVERY backend (the
                # real/auto contract): hashing b'' would emit a real-looking
                # vector for missing media while feature_backend stays null
                feats = [
                    row.tolist() if p is not None else None
                    for row, p in zip(
                        _fake_features(pdf["payload"]), pdf["payload"]
                    )
                ]
                backends = ["fake" if p is not None else None for p in pdf["payload"]]
            else:
                pairs = [_one(m, p) for m, p in zip(pdf["modality"], pdf["payload"])]
                feats = [f for f, _ in pairs]
                backends = [b for _, b in pairs]
            cols = {
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "features": feats,
            }
            if with_backend_col:
                cols["feature_backend"] = backends
            yield pd.DataFrame(cols)

    return df.mapInPandas(featurize, out_schema)


# ----------------------------------------------------------------- resize
def resize_images(
    df: DataFrame, max_side: int = 512, backend: str = "metadata"
) -> DataFrame:
    """Image resize stage.

    ``backend='metadata'``: native expressions compute the aspect-preserving
    target box only (plan-level; cheap pre-pass for size accounting).
    ``backend='real'``: mapInPandas decodes each image payload (BMP/PNG
    in-house, anything else via Pillow when present), resizes the pixel
    array (vectorized nearest-neighbor), re-encodes in the SOURCE format,
    and updates payload/width/height. Non-image rows pass through
    unchanged."""
    scale = F.least(
        F.lit(max_side) / F.greatest(F.col("width"), F.lit(1)),
        F.lit(max_side) / F.greatest(F.col("height"), F.lit(1)),
        F.lit(1.0),
    )
    with_target = df.withColumn(
        "target_width", F.ceil(F.col("width") * scale).cast("int")
    ).withColumn("target_height", F.ceil(F.col("height") * scale).cast("int"))
    if backend == "metadata":
        return with_target
    if backend != "real":
        raise ValueError(f"unknown resize backend: {backend}")
    schema = with_target.schema

    def do_resize(iterator):
        for pdf in iterator:
            payloads, widths, heights, mimes = [], [], [], []
            for m, p, tw, th, w, h, mi in zip(
                pdf["modality"], pdf["payload"], pdf["target_width"],
                pdf["target_height"], pdf["width"], pdf["height"],
                pdf["mime"],
            ):
                if m != "image" or p is None or (tw == w and th == h):
                    payloads.append(p)
                    widths.append(w)
                    heights.append(h)
                    mimes.append(mi)
                    continue
                # format-preserving for the in-house codecs: a PNG payload
                # re-encodes as PNG, BMP as BMP. A Pillow-decoded foreign
                # format (e.g. JPEG) re-encodes as BMP, and the mime column
                # is rewritten to match — downstream stages keyed on mime
                # must never see a JPEG label over BMP bytes
                data = bytes(p)
                arr = mc.decode_image_any(data)
                resized = mc.resize_nearest(arr, int(tw), int(th))
                if data[:8] == mc._PNG_SIG:
                    payloads.append(mc.encode_png(resized))
                    mimes.append("image/png")
                else:
                    payloads.append(mc.encode_bmp(resized))
                    mimes.append("image/bmp")
                widths.append(int(tw))
                heights.append(int(th))
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf["width"] = pd.array(widths, dtype="Int32")
            pdf["height"] = pd.array(heights, dtype="Int32")
            pdf["mime"] = mimes
            yield pdf

    return with_target.mapInPandas(do_resize, schema)


# ----------------------------------------------------------- frame sample
def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode one row per sampled frame
    timestamp (native sequence/explode — the decode stage seeks these
    offsets). Non-video rows pass through with frame_ms = null."""
    frames = F.when(
        (F.col("modality") == "video")
        & F.col("duration_ms").isNotNull()
        & (F.col("duration_ms") > 0),
        F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)),
    ).otherwise(F.array(F.lit(None).cast("int")))
    # NB the duration_ms > 0 guard: sequence(0, -1, every_ms) is an illegal
    # range (step sign vs direction) and would fail the whole job on one
    # zero-duration video; such rows pass through with frame_ms = null like
    # non-video rows
    return df.withColumn("frame_ms", F.explode(frames))


def extract_sampled_frames(df: DataFrame, every_n: int = 1) -> DataFrame:
    """Real frame extraction: decode every ``every_n``-th frame of each
    video payload into its own row (media_id, frame_index, frame:binary as
    a standalone BMP, width, height). The container's per-frame size fields
    are the seek table — only selected frames are decoded."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def explode_frames(iterator):
        for pdf in iterator:
            rows = []
            for mid, m, p in zip(pdf["media_id"], pdf["modality"], pdf["payload"]):
                if m != "video" or p is None:
                    continue
                data = bytes(p)
                for fi, off in enumerate(mc.frame_offsets(data)):
                    if fi % every_n:
                        continue
                    size = mc.bmp_size(data, off)
                    frame = data[off : off + size]
                    arr = mc.decode_bmp(frame)
                    rows.append((mid, fi, frame, arr.shape[1], arr.shape[0]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return df.mapInPandas(explode_frames, out_schema)
