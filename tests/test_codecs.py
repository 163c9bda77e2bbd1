"""Codec round-trip: decode(encode(x)) == x exactly (bit-for-bit)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyreshaper_ray.functions.codecs import (
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)


def test_dod_empty_and_tiny():
    for arr in ([], [5], [5, 7], [5, 7, 9]):
        a = np.array(arr, dtype=np.int64)
        assert np.array_equal(dod_decode(dod_encode(a)), a)


def test_dod_constant_spacing_compresses():
    """F1-e5: exact 60s grid → all-zero dod → ~1 bit per point."""
    ts = np.arange(0, 60_000_000 * 1000, 60_000_000, dtype=np.int64)
    blob = dod_encode(ts)
    assert np.array_equal(dod_decode(blob), ts)
    # header 4+8+8 bytes + ~1 bit per remaining point
    assert len(blob) < 20 + len(ts) // 8 + 2


def test_dod_microsecond_gaps():
    gaps = np.array([5, 30, 70, 400, 5, 400, 30] * 50, dtype=np.int64) * 1_000_000
    ts = np.concatenate([[1_767_225_600_000_000], 1_767_225_600_000_000 + np.cumsum(gaps)])
    assert np.array_equal(dod_decode(dod_encode(ts)), ts)


def test_dod_negative_and_large_dod():
    ts = np.array([0, 10**12, 10**12 + 1, 5, -(10**15), 0], dtype=np.int64)
    assert np.array_equal(dod_decode(dod_encode(ts)), ts)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=64))
def test_dod_roundtrip_property(xs):
    a = np.array(xs, dtype=np.int64)
    assert np.array_equal(dod_decode(dod_encode(a)), a)


def test_gorilla_empty_and_tiny():
    for arr in ([], [1.5], [1.5, 1.5], [1.5, -2.25, 3.0]):
        a = np.array(arr, dtype=np.float64)
        assert np.array_equal(gorilla_decode(gorilla_encode(a)), a)


def test_gorilla_constant_compresses():
    """F1-e5: identical consecutive values → XOR == 0 → 1 bit per point."""
    a = np.full(1000, 100.0)
    blob = gorilla_encode(a)
    assert np.array_equal(gorilla_decode(blob), a)
    assert len(blob) < 12 + len(a) // 8 + 2


def test_gorilla_sign_flips():
    """F1-e5 (conv000099 analog): sign-flipping values round-trip."""
    a = np.array([1.0, -1.0, 2.5, -2.5, 1e300, -1e-300, 0.0, -0.0], dtype=np.float64)
    dec = gorilla_decode(gorilla_encode(a))
    assert np.array_equal(dec.view(np.uint64), a.view(np.uint64))  # incl. -0.0


def test_gorilla_nan_bit_patterns():
    a = np.array([np.nan, 1.0, np.inf, -np.inf, np.nan], dtype=np.float64)
    dec = gorilla_decode(gorilla_encode(a))
    assert np.array_equal(dec.view(np.uint64), a.view(np.uint64))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, width=64),
        max_size=64,
    )
)
def test_gorilla_roundtrip_property(xs):
    a = np.array(xs, dtype=np.float64)
    dec = gorilla_decode(gorilla_encode(a))
    assert np.array_equal(dec.view(np.uint64), a.view(np.uint64))


def test_gorilla_int_valued_series():
    """char_len-like series (small ints as floats)."""
    a = (20 + (np.arange(2400) * 17) % 400).astype(np.float64)
    assert np.array_equal(gorilla_decode(gorilla_encode(a)), a)


def test_windowed_and_fast_encoders_interdecode():
    """Both Gorilla encoder policies produce valid streams for ONE decoder."""
    from pyreshaper_ray.functions.codecs import gorilla_encode_windowed

    a = (20 + (np.arange(5000) * 17) % 400).astype(np.float64)
    fast = gorilla_encode(a)
    windowed = gorilla_encode_windowed(a)
    assert np.array_equal(gorilla_decode(fast), a)
    assert np.array_equal(gorilla_decode(windowed), a)
    # windowed ('10'-reuse) must not be larger than the explicit-window form
    assert len(windowed) <= len(fast)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(allow_nan=False, width=64), max_size=40))
def test_windowed_encoder_roundtrip_property(xs):
    from pyreshaper_ray.functions.codecs import gorilla_encode_windowed

    a = np.array(xs, dtype=np.float64)
    dec = gorilla_decode(gorilla_encode_windowed(a))
    assert np.array_equal(dec.view(np.uint64), a.view(np.uint64))


def test_vectorized_gorilla_matches_windowed_reference_bytes():
    """The batch encoder's greedy-containment policy must be byte-identical
    to the sequential reference (same '10'/'11' decisions, same bit stream)."""
    from pyreshaper_ray.functions.codecs import gorilla_encode_windowed

    rng = np.random.default_rng(11)
    for _ in range(30):
        n = int(rng.integers(0, 800))
        vals = rng.choice([0.0, 1.5, -2.25, 1e300, 37.0, 5e-321], n)
        assert gorilla_encode(vals) == gorilla_encode_windowed(vals)
        rnd = rng.standard_normal(n)
        assert gorilla_encode(rnd) == gorilla_encode_windowed(rnd)


def test_windowed_smaller_than_explicit_on_metric_series():
    """'10' window reuse pays off on char_len-like series (~13 vs ~19 b/pt)."""
    from pyreshaper_ray.functions.codecs import gorilla_encode_explicit

    a = (20 + (np.arange(5000) * 17) % 400).astype(np.float64)
    assert len(gorilla_encode(a)) < 0.75 * len(gorilla_encode_explicit(a))
    assert np.array_equal(gorilla_decode(gorilla_encode_explicit(a)), a)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=80),
    st.integers(min_value=1, max_value=9),
)
def test_dod_stream_encoder_equals_batch(xs, chunk):
    from pyreshaper_ray.functions.codecs import DodStreamEncoder

    a = np.array(xs, dtype=np.int64)
    enc = DodStreamEncoder()
    for i in range(0, len(a), chunk):
        enc.push(a[i : i + chunk])
    assert enc.finish() == dod_encode(a)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.floats(allow_nan=False, width=64), max_size=80),
    st.integers(min_value=1, max_value=9),
)
def test_gorilla_stream_encoder_equals_batch(xs, chunk):
    from pyreshaper_ray.functions.codecs import GorillaStreamEncoder

    a = np.array(xs, dtype=np.float64)
    enc = GorillaStreamEncoder()
    for i in range(0, len(a), chunk):
        enc.push(a[i : i + chunk])
    assert enc.finish() == gorilla_encode(a)


def test_segmented_bucket_encode_byte_identical(ray_session):
    """encode_series_bucket's one-pass segmented packer must equal the
    per-conversation codecs byte-for-byte — including conversations that
    hit every edge: 1 and 2 turns, zero dods, wide (>2^31 µs) dods that
    split into prefix+payload tokens, huge char_len jumps that defeat
    window reuse, NaN payloads, and identical-value runs."""
    import numpy as np
    import pyarrow as pa

    from pyreshaper_ray.functions.codecs import dod_encode, gorilla_encode
    from pyreshaper_ray.pipelines.bucket import (
        _conv_boundaries,
        encode_series_bucket,
    )

    rng = np.random.default_rng(7)
    convs = []
    base = 1_700_000_000_000_000
    specs = [
        ("a1", [0]),                                   # single turn
        ("b2", [0, 60_000_000]),                       # two turns, no tokens
        ("c_const", list(range(0, 600_000_000, 60_000_000))),  # zero dods
        ("d_wide", [0, 1_000_000, 2_000_000, 2_000_000 + 2**33, 2_000_000 + 2**34]),  # wide dod split
        ("e_rand", sorted(rng.integers(0, 10**9, 40).tolist())),
    ]
    rows = {"conv_id": [], "ts": [], "char_len": []}
    for cid, offs in specs:
        vals = rng.integers(0, 5000, len(offs)).astype(np.float64)
        if cid == "e_rand":
            vals[3] = np.nan          # NaN payload
            vals[4:8] = vals[3 - 1]   # identical run
            vals[10] = 1e300          # huge jump
        for o, v in zip(offs, vals):
            rows["conv_id"].append(cid)
            rows["ts"].append(base + int(o))
            rows["char_len"].append(float(v))
    t = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "ts": pa.array(
                np.array(rows["ts"], dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "char_len": pa.array(rows["char_len"], pa.float64()),
        }
    )
    out = encode_series_bucket(t)
    bounds = _conv_boundaries(t["conv_id"])
    ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    vals = t["char_len"].to_numpy(zero_copy_only=False).astype(np.float64)
    dd = out["dod_ts"].to_pylist()
    gg = out["gorilla_char_len"].to_pylist()
    for k in range(len(bounds) - 1):
        lo, hi = int(bounds[k]), int(bounds[k + 1])
        assert dd[k] == dod_encode(ts[lo:hi]), f"dod conv {k}"
        assert gg[k] == gorilla_encode(vals[lo:hi]), f"gorilla conv {k}"
