"""Codec round-trip identity (SURVEY §5 strategy c: Gorilla encode→decode
round-trip) + compression-ratio sanity on realistic tier series, plus
property-based fuzzing with hypothesis."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from preprocessor_spark.rollup.codec import (
    compression_ratio,
    dod_decode,
    dod_encode,
    xor_decode,
    xor_encode,
)

RNG = np.random.default_rng(42)


# ---------------------------------------------------------------- dod ints
@pytest.mark.parametrize(
    "arr",
    [
        np.array([], np.int64),
        np.array([7], np.int64),
        np.array([7, 9], np.int64),
        np.arange(0, 4096 * 3600, 3600, dtype=np.int64),  # regular timestamps
        np.array([0, 1, -1, 2**40, -(2**40), 0, 0, 5], np.int64),
        RNG.integers(-(2**62), 2**62, 1000),
    ],
)
def test_dod_roundtrip(arr):
    assert np.array_equal(dod_decode(dod_encode(arr)), np.asarray(arr, np.int64))


def test_dod_regular_timestamps_compress_hard():
    ts = np.arange(0, 4096 * 3600, 3600, dtype=np.int64)
    blob = dod_encode(ts)
    # dod == 0 everywhere → ~2 bits/point; ratio vs raw int64 > 20×
    assert compression_ratio(blob, len(ts)) > 20


def test_dod_counts_series():
    counts = RNG.poisson(100, 4096).astype(np.int64)
    blob = dod_encode(counts)
    assert np.array_equal(dod_decode(blob), counts)
    assert compression_ratio(blob, len(counts)) > 2


# ---------------------------------------------------------------- xor floats
@pytest.mark.parametrize(
    "arr",
    [
        np.array([], np.float64),
        np.array([3.25], np.float64),
        np.array([3.25, 3.25, 3.25], np.float64),
        np.array([1.0, -1.0, np.inf, -np.inf, 0.0, -0.0], np.float64),
        RNG.normal(1000.0, 1.0, 2000),
        np.round(RNG.normal(50, 3, 4096)),  # integral floats (tier stats)
    ],
)
def test_xor_roundtrip_exact_bits(arr):
    out = xor_decode(xor_encode(arr))
    assert np.array_equal(
        out.view(np.uint64), np.asarray(arr, np.float64).view(np.uint64)
    )


def test_xor_nan_roundtrip():
    arr = np.array([1.0, np.nan, 2.0, np.nan, np.nan], np.float64)
    out = xor_decode(xor_encode(arr))
    assert np.array_equal(np.isnan(out), np.isnan(arr))
    assert np.array_equal(out[~np.isnan(out)], arr[~np.isnan(arr)])


def test_xor_slowly_varying_compresses():
    # slowly varying series: many shared leading/trailing bits
    v = 100.0 + np.cumsum(RNG.choice([0.0, 0.25, -0.25], 4096))
    blob = xor_encode(v)
    assert compression_ratio(blob, len(v)) > 1.5
    constant = np.full(4096, 42.0)
    assert compression_ratio(xor_encode(constant), 4096) > 25


# ------------------------------------------------------------- hypothesis
@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-(2**63), 2**63 - 1), max_size=300))
def test_dod_roundtrip_fuzz(xs):
    arr = np.array(xs, dtype=np.int64)
    assert np.array_equal(dod_decode(dod_encode(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, width=64),
        max_size=300,
    )
)
def test_xor_roundtrip_fuzz(xs):
    arr = np.array(xs, dtype=np.float64)
    out = xor_decode(xor_encode(arr))
    assert np.array_equal(out.view(np.uint64), arr.view(np.uint64))
