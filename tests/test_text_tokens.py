"""Text analysis + token functions + multimodal plumbing + sources."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from preprocessor_spark.functions import text as tx
from preprocessor_spark.functions import tokens as tk
from preprocessor_spark.synth import token_sequences


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The cat sat on the mat and it was happy for the day", "en"),
        (2, "der hund ist nicht mit der katze und das ist gut", "de"),
        (3, "le chat est sur la table et il est pour une heure", "fr"),
        (4, "xyzzy plugh qwop", "und"),
        (5, "", "und"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "expected_lang"]).cache()


def test_language_detection(spark, docs):
    out = docs.withColumn("lang", tx.detect_language("text")).collect()
    for r in out:
        if r["expected_lang"] != "und":
            assert r["lang"] == r["expected_lang"], r["text"]
        else:
            assert r["lang"] == "und"


def test_token_counts_and_quality(spark, docs):
    out = (
        docs.filter("doc_id = 1")
        .select(
            tx.whitespace_token_count("text").alias("nw"),
            tx.regex_token_count("text").alias("nt"),
            tx.punct_ratio("text").alias("pr"),
            tx.quality_score("text").alias("q"),
        )
        .collect()[0]
    )
    assert out["nw"] == 13
    assert out["nt"] == 13  # no punctuation → same as words
    assert out["pr"] == 0.0
    assert 0.0 <= out["q"] <= 1.0 and out["q"] >= 0.8  # clean English text


def test_doc_and_rolling_fingerprints(spark, docs):
    fp = docs.select("doc_id", tx.doc_fingerprint("text").alias("f")).collect()
    vals = {r["doc_id"]: r["f"] for r in fp}
    assert len(set(vals.values())) == len(vals)  # distinct texts → distinct fps
    roll = (
        docs.filter("doc_id=1")
        .select(F.size(tx.rolling_fingerprints("text", k=4)).alias("n"))
        .collect()[0]["n"]
    )
    assert roll == 13 - 4 + 1


def test_token_functions_on_corpus(spark):
    corpus = token_sequences(spark, 2000)
    assert tk.verify_n_tok(corpus).count() == 0
    stats = tk.token_stats(corpus).collect()
    assert {r["source"] for r in stats} == {f"s{i}" for i in range(7)}
    trunc = tk.truncate_tokens(corpus, 8)
    assert trunc.filter(F.col("n_tok") > 8).count() == 0
    # fingerprint equality invariant: same pipeline twice → identical hashes
    a = corpus.select("doc_id", tk.token_fingerprint().alias("fa"))
    b = token_sequences(spark, 2000).select(
        "doc_id", tk.token_fingerprint().alias("fb")
    )
    assert a.join(b, "doc_id").filter(F.col("fa") != F.col("fb")).count() == 0


def test_pack_sequences(spark):
    corpus = token_sequences(spark, 500)
    packed = tk.pack_sequences(corpus, target_len=512)
    out = packed.select(
        "source", "bin_id", F.size("tokens").alias("sz"), "n_tok_packed"
    ).collect()
    assert all(r["sz"] == r["n_tok_packed"] for r in out)
    total_in = corpus.agg(F.sum("n_tok")).collect()[0][0]
    total_out = packed.agg(F.sum("n_tok_packed")).collect()[0][0]
    assert total_in == total_out  # packing loses nothing


def test_multimodal_plumbing(spark):
    from preprocessor_spark.functions.multimodal import (
        FEATURE_DIM,
        extract_features,
        resize_images,
        sample_frames,
        synth_media,
    )

    media = synth_media(spark, 300).cache()
    assert media.count() == 300
    # REAL backend: decodes BMP/WAV/frame payloads and featurizes content
    feats = extract_features(media, decode_backend="real").cache()
    assert feats.count() == 300
    row = feats.first()
    assert len(row["features"]) == FEATURE_DIM
    # determinism: same payload → same features
    again = extract_features(media, decode_backend="real")
    joined = feats.alias("a").join(again.alias("b"), "media_id")
    diff = joined.filter(F.col("a.features") != F.col("b.features")).count()
    assert diff == 0
    # the content-blind hash featurizer also still works
    assert extract_features(media, decode_backend="fake").count() == 300
    # 'auto' (the default): real decode for in-house formats, per-row hash
    # fallback for foreign payloads (e.g. JPEG bytes) — never throws mid-job
    foreign = media.withColumn(
        "payload",
        F.when(F.col("modality") == "image", F.lit(b"\xff\xd8\xff\xe0junk")).otherwise(
            F.col("payload")
        ),
    )
    auto = extract_features(foreign).cache()
    assert auto.count() == 300
    assert auto.filter(F.col("features").isNull()).count() == 0
    # observability: with_backend_col tags exactly the foreign (image) rows
    # as hash-fallback, everything else as real decode
    tagged = extract_features(foreign, with_backend_col=True).cache()
    n_img = media.filter("modality = 'image'").count()
    assert tagged.filter(F.col("feature_backend") == "fake").count() == n_img
    assert (
        tagged.filter(F.col("feature_backend") == "real").count() == 300 - n_img
    )
    # narrow catch: a genuine decoder BUG (non-codec exception) must still
    # surface under 'auto', not silently degrade to hash features
    import pytest as pt
    from unittest import mock

    import preprocessor_spark.functions.multimodal as mm

    assert mm._features_auto("image", b"\xff\xd8junk")[1] == "fake"  # codec signal
    with mock.patch.object(
        mm, "_real_features", side_effect=TypeError("decoder bug")
    ):
        with pt.raises(TypeError):
            mm._features_auto("image", b"anything")
    # resize plan: target box bounded and aspect preserved-ish
    imgs = resize_images(media.filter("modality = 'image'"), max_side=256)
    bad = imgs.filter(
        (F.col("target_width") > 256) | (F.col("target_height") > 256)
    ).count()
    assert bad == 0
    # frame sampling: one row per second of video
    vids = sample_frames(media.filter("modality = 'video'"), every_ms=1000)
    one = vids.groupBy("media_id").count().join(
        media.select("media_id", "duration_ms"), "media_id"
    )
    mismatched = one.filter(
        F.col("count") != F.ceil(F.col("duration_ms") / 1000.0)
    ).count()
    assert mismatched == 0


def test_sources_io(spark, tmp_path):
    from preprocessor_spark.sources import (
        detect_format,
        load_data,
        load_timeseries_csv,
        sniff_csv_separator,
        write_split_datasets,
    )

    assert detect_format("x.parquet") == "parquet"
    assert detect_format("x.jsonl") == "json"
    with pytest.raises(ValueError):
        detect_format("x.xlsx")

    # semicolon CSV with legacy dayfirst timestamps + a bad numeric cell
    p = tmp_path / "legacy.csv"
    p.write_text(
        "DATE_TIME;OPEN;CLOSE\n"
        "13/01/2020 9:30;1.5;2.5\n"
        "14/01/2020 9:30;oops;3.5\n"
    )
    assert sniff_csv_separator(spark, str(p)) == ";"
    df = load_timeseries_csv(spark, str(p), ts_format="d/M/yyyy H:mm")
    rows = df.orderBy("DATE_TIME").collect()
    assert rows[0]["DATE_TIME"].day == 13  # dayfirst honored
    assert rows[1]["OPEN"] is None  # errors='coerce' → null
    assert rows[1]["CLOSE"] == 3.5

    # split sink: partitioned layout with all six labels
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2020-01-01", periods=60, freq="min"),
            "v": np.arange(60.0),
        }
    )
    from preprocessor_spark.operators import TemporalSplitter

    labeled = TemporalSplitter().transform(spark.createDataFrame(pdf))
    out = str(tmp_path / "splits")
    write_split_datasets(labeled, out)
    back = spark.read.parquet(out)
    assert back.count() == 60
    assert back.select("split_id").distinct().count() == 6


def test_media_codecs_roundtrip():
    """Pure-numpy BMP/WAV/frame-container codecs: encode→decode is exact."""
    import numpy as np

    from preprocessor_spark.functions import media_codecs as mc

    rng = np.random.default_rng(7)
    # BMP round-trip, including widths that need 4-byte row padding
    for w, h in ((5, 3), (8, 8), (33, 17)):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        back = mc.decode_bmp(mc.encode_bmp(arr))
        assert np.array_equal(arr, back), (w, h)
    # WAV round-trip
    x = rng.normal(0, 5000, 4321).astype(np.int16)
    rate, back = mc.decode_wav(mc.encode_wav(x, 8000))
    assert rate == 8000 and np.array_equal(x, back)
    # frame container round-trip + seek table
    frames = [
        rng.integers(0, 256, (6, 9, 3), dtype=np.uint8) for _ in range(4)
    ]
    data = mc.encode_frames(frames)
    assert len(mc.frame_offsets(data)) == 4
    for a, b in zip(frames, mc.decode_frames(data)):
        assert np.array_equal(a, b)
    # resize: exact for integer upscale of a constant image
    const = np.full((4, 4, 3), 77, dtype=np.uint8)
    up = mc.resize_nearest(const, 8, 8)
    assert up.shape == (8, 8, 3) and (up == 77).all()


def test_png_codec_roundtrip_and_filters():
    """Stdlib-zlib PNG codec: exact round-trip for every supported color
    type, all five scanline filters decoded against an independent
    reference implementation, CRC verification, and decode_image_any
    dispatch — the real-compressed-format path exercised with no Pillow."""
    import struct
    import zlib

    import numpy as np
    import pytest as pt

    from preprocessor_spark.functions import media_codecs as mc

    rng = np.random.default_rng(11)
    # round-trip: gray, gray+alpha, RGB, RGBA at awkward sizes
    for shape in ((3, 5), (7, 2, 2), (5, 9, 3), (4, 3, 4), (1, 1, 3)):
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        back = mc.decode_png(mc.encode_png(arr))
        want = arr[:, :, None] if arr.ndim == 2 else arr
        assert np.array_equal(back, want), shape

    # all five filters: craft raw scanlines with filter bytes 0..4 and
    # compare against a from-the-spec scalar reference unfilter
    h, w, c = 5, 4, 3
    raw_rows = rng.integers(0, 256, (h, w * c), dtype=np.uint8)
    filt = np.array([0, 1, 2, 3, 4], dtype=np.uint8)
    scan = b"".join(
        bytes([filt[y]]) + raw_rows[y].tobytes() for y in range(h)
    )

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    got = mc.decode_png(png)

    # independent reference: straight transcription of RFC 2083 §6
    ref = np.zeros((h, w * c), dtype=np.int64)
    for y in range(h):
        for x in range(w * c):
            rv = int(raw_rows[y, x])
            left = ref[y, x - c] if x >= c else 0
            up = ref[y - 1, x] if y >= 1 else 0
            ul = ref[y - 1, x - c] if (x >= c and y >= 1) else 0
            if filt[y] == 0:
                val = rv
            elif filt[y] == 1:
                val = rv + left
            elif filt[y] == 2:
                val = rv + up
            elif filt[y] == 3:
                val = rv + (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                if pa <= pb and pa <= pc:
                    pred = left
                elif pb <= pc:
                    pred = up
                else:
                    pred = ul
                val = rv + pred
            ref[y, x] = val % 256
    assert np.array_equal(got.reshape(h, w * c), ref.astype(np.uint8))

    # a flipped bit must fail the CRC check, not decode silently
    bad = bytearray(png)
    bad[40] ^= 0x01
    with pt.raises(ValueError, match="CRC|IHDR|signature"):
        mc.decode_png(bytes(bad))

    # decode_image_any dispatches PNG without Pillow and converts to RGB
    rgb = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_image_any(mc.encode_png(rgb)), rgb)
    gray = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    out = mc.decode_image_any(mc.encode_png(gray))
    assert out.shape == (4, 4, 3) and np.array_equal(out[:, :, 0], gray)
    rgba = rng.integers(0, 256, (3, 3, 4), dtype=np.uint8)
    assert np.array_equal(
        mc.decode_image_any(mc.encode_png(rgba)), rgba[:, :, :3]
    )

    # truncated chunk framing (length field past the buffer) must surface
    # as the documented ValueError, not a raw struct.error
    trunc = bytes(png[:16])
    with pt.raises(ValueError):
        mc.decode_image_any(trunc)


def test_png_truncated_idat_is_a_codec_signal_not_a_crash():
    """A PNG whose chunks are individually CRC-valid but whose concatenated
    IDAT deflate stream is cut short raises zlib.error inside decode_png;
    decode_image_any and the 'auto' featurizer must treat that as the
    same not-decodable-here signal as ValueError/struct.error — NOT let it
    escape and fail the whole Spark job."""
    import struct
    import zlib

    import numpy as np
    import pytest as pt

    from preprocessor_spark.functions import media_codecs as mc
    import preprocessor_spark.functions.multimodal as mm

    rng = np.random.default_rng(7)
    png = mc.encode_png(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))

    # re-frame the file with the IDAT deflate bytes cut in half, CRC
    # recomputed over the truncated body so chunk framing stays valid
    def chunks(buf):
        off = 8
        while off < len(buf):
            (ln,) = struct.unpack(">I", buf[off : off + 4])
            tag = buf[off + 4 : off + 8]
            body = buf[off + 8 : off + 8 + ln]
            yield tag, body
            off += 12 + ln

    out = bytearray(png[:8])
    for tag, body in chunks(png):
        if tag == b"IDAT":
            body = body[: len(body) // 2]
        out += struct.pack(">I", len(body)) + tag + body
        out += struct.pack(">I", zlib.crc32(tag + body))
    cut = bytes(out)

    with pt.raises(zlib.error):
        mc.decode_png(cut)  # the raw codec's contract is unchanged
    # the dispatcher maps it to the documented ValueError (no PIL here)
    # or decodes via PIL when available — never a raw zlib.error
    if not mc.HAVE_PIL:
        with pt.raises(ValueError):
            mc.decode_image_any(cut)
    assert mm._features_auto("image", cut)[1] == "fake"


def test_multimodal_real_resize_and_frames(spark):
    """Real pixel resize re-encodes each decodable image at the target box
    PRESERVING its source format (PNG stays PNG, BMP stays BMP — the mime
    column stays truthful); real frame extraction yields one standalone
    decodable BMP per frame."""
    import numpy as np

    from preprocessor_spark.functions import media_codecs as mc
    from preprocessor_spark.functions.multimodal import (
        extract_sampled_frames,
        resize_images,
        synth_media,
    )

    media = synth_media(spark, 60).cache()
    imgs = media.filter("modality = 'image'")
    # the synth corpus must exercise BOTH image formats distributed
    mimes = {r["mime"] for r in imgs.select("mime").distinct().collect()}
    assert mimes == {"image/bmp", "image/png"}
    resized = resize_images(imgs, max_side=16, backend="real").cache()
    rows = resized.collect()
    assert rows
    for r in rows:
        assert max(r["width"], r["height"]) <= 16
        data = bytes(r["payload"])
        if r["mime"] == "image/png":
            assert data[:8] == mc._PNG_SIG  # format preserved
            arr = mc.decode_png(data)
        else:
            arr = mc.decode_bmp(data)
        assert arr.shape == (r["height"], r["width"], 3)

    vids = media.filter("modality = 'video'")
    frames = extract_sampled_frames(vids).cache()
    per = {
        r["media_id"]: r["count"]
        for r in frames.groupBy("media_id").count().collect()
    }
    want = {
        r["media_id"]: r["duration_ms"] // 1000
        for r in vids.select("media_id", "duration_ms").collect()
    }
    assert per == want  # synth encodes one frame per second of duration
    f = frames.first()
    arr = mc.decode_bmp(bytes(f["frame"]))
    assert arr.shape == (f["height"], f["width"], 3)


def test_multimodal_oracle_arithmetic(spark):
    """synth_media_sql + the real decode pipeline must reproduce the pure
    md5 arithmetic the driver oracle (oracle_sql()['multimodal_pipeline'])
    uses — checked here against a THIRD independent implementation
    (hashlib), so Spark md5, DuckDB md5, and Python md5 all agree on every
    derived parameter, and the decoded CONTENT (constant fill / amplitude)
    survives the encode→decode round-trip exactly."""
    import hashlib

    from preprocessor_spark.functions.multimodal import (
        extract_features,
        synth_media_sql,
    )

    ids = spark.range(60).select(F.col("id").alias("doc_id"))
    media = synth_media_sql(ids).cache()
    feats = {
        r["media_id"]: (r["modality"], r["features"])
        for r in extract_features(media, decode_backend="real").collect()
    }
    sizes = {
        r["media_id"]: len(bytes(r["payload"]))
        for r in media.select("media_id", "payload").collect()
    }
    assert len(feats) == 60
    for i in range(60):
        m = hashlib.md5(str(i).encode()).hexdigest()
        hx = lambda s, l: int(m[s - 1 : s - 1 + l], 16)
        mi = hx(1, 2) % 3
        modality, f = feats[str(i)]
        assert modality == ("image", "audio", "video")[mi]
        if mi == 1:
            n = 2000 + hx(9, 4) % 6000
            amp = hx(13, 4) % 20001 - 10000
            assert sizes[str(i)] == 44 + 2 * n
            assert round(f[0] * 60 * 8000) == n
            assert round(f[1] * 32768) == abs(amp)  # rms of constant signal
        else:
            if mi == 0:
                w, h, frames = 8 + hx(3, 2) % 56, 8 + hx(5, 2) % 40, 1
            else:
                w, h = 8 + hx(3, 2) % 16, 8 + hx(5, 2) % 8
                frames = 2 + hx(17, 1) % 4
            stride = 3 * w + (4 - (3 * w) % 4) % 4
            assert sizes[str(i)] == frames * (54 + h * stride)
            assert round(f[0] * 4096) == w and round(f[1] * 4096) == h
            # decoded mean channel level == the constant fill, exactly
            assert round(f[2] * 255) == hx(7, 2)
            assert round(f[5] * 255) == 0  # constant image: zero std
    media.unpersist()


def test_real_format_decoders_when_libs_present(spark):
    """Optional-library seam: with Pillow installed, decode_image_any must
    decode a real PNG/JPEG; with soundfile, decode_audio_any a FLAC. Skips
    where the libraries are absent (this sandbox); the in-house-codec
    fallback ordering is covered either way."""
    import numpy as np
    import pytest as pt

    from preprocessor_spark.functions import media_codecs as mc

    # in-house codecs always win first — byte-identical behavior
    arr = np.zeros((4, 5, 3), dtype=np.uint8)
    arr[1, 2] = (10, 200, 30)
    assert (mc.decode_image_any(mc.encode_bmp(arr)) == arr).all()
    rate, samples = mc.decode_audio_any(
        mc.encode_wav(np.arange(-5, 5, dtype=np.int16), 8000)
    )
    assert rate == 8000 and samples.tolist() == list(range(-5, 5))
    # undecodable payloads raise ValueError (the 'auto' fallback signal)
    with pt.raises(ValueError):
        mc.decode_image_any(b"\x89PNG....truncated" if not mc.HAVE_PIL else b"junk")
    if not mc.HAVE_PIL:
        pt.skip("Pillow not installed — real JPEG/PNG decode not testable here")
    import io

    import PIL.Image as Image

    im = Image.fromarray(arr)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    assert (mc.decode_image_any(buf.getvalue()) == arr).all()


def test_words_drops_empty_tokens_and_padding(spark):
    """' the cat' must tokenize exactly like 'the cat': a raw whitespace
    split yields a '' first token that skews counts and makes
    word-set/shingle dedup keys differ for byte-identical-after-trim
    duplicates."""
    from preprocessor_spark.functions.text import whitespace_token_count, words

    df = spark.createDataFrame(
        [(" the cat",), ("the cat",), ("",), ("   ",)], "text string"
    )
    rows = df.select(
        words("text").alias("w"), whitespace_token_count("text").alias("n")
    ).collect()
    assert rows[0]["w"] == rows[1]["w"] == ["the", "cat"]
    assert rows[0]["n"] == rows[1]["n"] == 2
    assert rows[2]["w"] == [] and rows[2]["n"] == 0
    assert rows[3]["w"] == [] and rows[3]["n"] == 0
    # word-set dedup keys now agree for padded duplicates
    from preprocessor_spark.functions.dedup import dedup_word_set

    d = spark.createDataFrame(
        [("a", " the cat"), ("b", "the cat")], "doc_id string, text string"
    )
    assert dedup_word_set(d).count() == 1


def test_stopword_ratio_counts_occurrences_not_distinct(spark):
    """The quality ratio must count stopword OCCURRENCES: the distinct
    overlap caps at 10, so distinct/total inverted into a length penalty —
    every clean document past ~200 words failed the stopword gate."""
    from preprocessor_spark.functions.text import quality_score, stopword_ratio

    long_english = " ".join(
        ["the quick brown fox jumps over the lazy dog and it was fine"] * 40
    )  # 480 words, ~25% stopword mass, every word 3-5 chars
    df = spark.createDataFrame([(long_english,)], "text string")
    r = df.select(
        F.round(stopword_ratio("text"), 4).alias("r"),
        quality_score("text").alias("q"),
    ).collect()[0]
    assert r["r"] >= 0.2  # distinct-based ratio would be 10/480 ≈ 0.02
    assert r["q"] == 1.0  # long clean English text is full quality


def test_mutual_information_drops_null_rows(spark):
    """NULL feature/label values must not fall through the bin ladder into
    the TOP quantile bin: MI over a half-null column must equal MI over
    its non-null subset (pairwise-complete semantics)."""
    import numpy as np

    from preprocessor_spark.functions.analysis import mutual_information

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 400)
    y = x * 2 + rng.normal(0, 0.1, 400)
    rows = [
        (float(x[i]) if i % 2 == 0 else None, float(y[i])) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    sub = df.filter(F.col("x").isNotNull())
    mi_full = {
        r["feature"]: r["mi_bits"]
        for r in mutual_information(df, ["x"], "y", bins=4).collect()
    }
    mi_sub = {
        r["feature"]: r["mi_bits"]
        for r in mutual_information(sub, ["x"], "y", bins=4).collect()
    }
    # not exactly equal (quantile edges fit on different label sets), but
    # the null rows must not create a fabricated joint cell: both are
    # strongly informative and within a small band
    assert mi_full["x"] is not None and mi_sub["x"] is not None
    assert abs(mi_full["x"] - mi_sub["x"]) < 0.35
    all_null = df.withColumn("x", F.lit(None).cast("double"))
    out = mutual_information(all_null, ["x"], "y", bins=4).collect()
    assert len(out) == 1  # contract row survives, no crash


def test_detect_format_parquet_directory(spark, tmp_path):
    """A parquet DATASET is a directory: detect_format must identify it by
    a data file's magic bytes instead of text-sniffing compressed binary
    (which could mis-read as CSV or fail with 'unsupported extension')."""
    from preprocessor_spark.sources import detect_format, load_data

    p = str(tmp_path / "corpus_dir")
    token_sequences(spark, 100).write.parquet(p)
    assert detect_format(p, spark) == "parquet"
    assert load_data(spark, p).count() == 100


def test_zero_bfsize_frame_is_a_codec_error_not_a_hang(spark):
    """A corrupt frame container whose header claims bfSize=0 must raise
    the ValueError codec signal: the container walkers advance by bfSize,
    so a zero would spin decode_frames/frame_offsets forever — an executor
    HANG the 'auto' decode policy cannot degrade from."""
    import struct

    import pytest as pt

    from preprocessor_spark.functions import media_codecs as mc
    import preprocessor_spark.functions.multimodal as mm

    bad = b"BM" + struct.pack("<IHHI", 0, 0, 0, 54) + b"\x00" * 64
    with pt.raises(ValueError, match="bfSize"):
        mc.bmp_size(bad)
    with pt.raises(ValueError):
        mc.decode_frames(bad)
    with pt.raises(ValueError):
        mc.frame_offsets(bad)
    # 'auto' featurization degrades to the hash featurizer, no hang
    assert mm._features_auto("video", bad)[1] == "fake"


def test_sample_frames_zero_duration_video(spark):
    """sequence(0, -1, step) is an illegal range: a zero-duration video
    must pass through with frame_ms null instead of failing the job."""
    from pyspark.sql import types as T

    from preprocessor_spark.functions.multimodal import MEDIA_SCHEMA, sample_frames

    rows = [
        ("v0", "video", None, None, None, None, 0),
        ("v1", "video", None, None, None, None, 2500),
        ("i0", "image", None, None, 4, 4, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        (r["media_id"], r["frame_ms"])
        for r in sample_frames(df, every_ms=1000).collect()
    }
    assert ("v0", None) in got and ("i0", None) in got
    assert {m for m, f in got if m == "v1"} == {"v1"}
    assert sorted(f for m, f in got if m == "v1") == [0, 1000, 2000]


def test_fake_backend_null_payload_yields_null_features(spark):
    """Null payloads yield null features on EVERY backend: the fake path
    hashed b'' into a real-looking vector while feature_backend stayed
    null — junk features for missing media."""
    from pyspark.sql import functions as F

    from preprocessor_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        synth_media,
    )

    media = synth_media(spark, 20).withColumn(
        "payload",
        F.when(F.col("media_id") == F.lit("m-000000000"), F.lit(None)).otherwise(
            F.col("payload")
        ),
    )
    out = extract_features(media, decode_backend="fake", with_backend_col=True)
    nulls = out.filter(F.col("features").isNull())
    assert nulls.count() == media.filter(F.col("payload").isNull()).count()
    assert (
        out.filter(
            F.col("features").isNull() != F.col("feature_backend").isNull()
        ).count()
        == 0
    )


def test_detect_format_hive_partitioned_parquet_directory(spark, tmp_path):
    """Hive-partitioned datasets (the repo's own writers produce these)
    have only _SUCCESS and key=value/ subdirs at the top level: the content
    sniff must find the nested data files, not fall through to a text scan
    over compressed binary (which could mis-sniff 'csv' on a stray comma
    byte)."""
    from preprocessor_spark.sources.io import detect_format, load_data

    p = str(tmp_path / "parts")
    token_sequences(spark, 200).write.partitionBy("source").parquet(p)
    import os

    assert all(
        e == "_SUCCESS" or e.startswith("source=")
        for e in os.listdir(p)
        if not e.startswith(".")  # local-FS .crc siblings
    )
    assert any(e.startswith("source=") for e in os.listdir(p))
    assert detect_format(p, spark) == "parquet"
    assert load_data(spark, p).count() == 200


def test_verify_n_tok_flags_null_invariant_violations(spark):
    """A NULL n_tok (or NULL tokens array) IS a violation of the
    n_tok == size(tokens) invariant: the plain != comparison evaluated to
    NULL there and the corrupt row escaped the verifier."""
    rows = [
        ([1, 2, 3], 3),   # fine
        ([1, 2], None),   # violation: null count
        (None, 2),        # violation: null tokens
        ([1], 5),         # violation: wrong count
    ]
    df = spark.createDataFrame(rows, "tokens array<int>, n_tok int")
    assert tk.verify_n_tok(df).count() == 3


def test_pack_sequences_duplicate_doc_ids(spark):
    """Duplicate doc_ids within a source are window PEERS: the default
    RANGE frame gave every peer the sum including all peers, corrupting
    bin-start offsets; the explicit ROWS frame packs them correctly."""
    rows = [
        ("s0", "d1", [1] * 60, 60),
        ("s0", "d1", [2] * 60, 60),  # duplicate id, same source
        ("s0", "d2", [3] * 60, 60),
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, tokens array<int>, n_tok int"
    )
    out = tk.pack_sequences(df, target_len=128).collect()
    assert sum(r["n_tok_packed"] for r in out) == 180  # packing loses nothing
    # 60+60 fit bin 0 (cum-n_tok = 0 and 60 < 128); the third doc starts at
    # 120 → falls into bin 0 too under ROWS... no: (180-60)/128 = 0 → one bin
    # of all three? cum after 3rd = 180, start = 120 < 128 → bin 0. All in one.
    assert len(out) == 1 and out[0]["n_tok_packed"] == 180


def test_token_ngram_keys_distinguish_null_windows(spark):
    """concat_ws SKIPS null elements, so windows with differently placed
    nulls used to collapse onto one key (spurious contamination hits); the
    array hash keeps them distinct."""
    from pyspark.sql import functions as F

    from preprocessor_spark.functions.decontam import token_ngram_keys

    rows = [([1, None, 2],), ([1, 2, None],), ([None, 1, 2],)]
    df = spark.createDataFrame(rows, "tokens array<int>")
    keys = [
        r["k"][0]
        for r in df.select(token_ngram_keys("tokens", 3).alias("k")).collect()
    ]
    assert len(set(keys)) == 3
