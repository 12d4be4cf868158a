"""Native (C) codec fast paths must be byte-identical to the numpy
reference implementations — fsst.compress and rlev2.encode dispatch to
goorc_spark.codecs._native when a C compiler is available and fall back to
numpy otherwise, so these A/B tests ARE the correctness contract for the
fast path (plus: every ported goorc byte vector in test_rlev2.py already
runs through the native path when it is available)."""

from __future__ import annotations

import contextlib
import random

import numpy as np
import pytest

from goorc_spark.codecs import _native, fsst, rlev2

pytestmark = pytest.mark.skipif(
    _native.lib() is None, reason="no C compiler / native lib unavailable")


@contextlib.contextmanager
def numpy_only():
    """Force the numpy path regardless of native availability."""
    old = _native._lib_cache[:]
    _native._lib_cache.clear()
    _native._lib_cache.append(None)
    try:
        yield
    finally:
        _native._lib_cache.clear()
        _native._lib_cache.extend(old)


def _fsst_cases():
    rng = random.Random(42)
    text = (b"user: how do I sort a list in python?\n"
            b"assistant: use sorted(xs) or xs.sort(); sorted returns a new "
            b"list while .sort() is in-place.\n") * 400
    cases = [
        b"", b"a", b"ab", text, text[:97],
        b"aaaaaaaa" * 500, b"abcabcabc" * 2000,
        bytes([255]) * 64, bytes([255, 97]) * 300,
        bytes(rng.randrange(256) for _ in range(4096)),
    ]
    for _ in range(25):
        m = rng.randrange(1, 1500)
        base = bytes(rng.choice(b"abcde \xff") for _ in range(m))
        cases.append(base * rng.randrange(1, 4))
    return cases


def test_fsst_native_matches_numpy_bytes():
    for i, data in enumerate(_fsst_cases()):
        ct = fsst.compile_table(fsst.train(data))
        a = fsst.compress(data, ct)
        with numpy_only():
            b = fsst.compress(data, ct)
        assert a == b, f"fsst case {i}: native != numpy"
        assert fsst.decompress(a) == data, f"fsst case {i}: roundtrip"


def _rlev2_cases():
    rng = random.Random(1234)
    cases = [
        ([], True), ([], False), ([7], True),
        ([10000] * 5, True), (list(range(100)), True),
        ([2, 3, 5, 7, 11, 13, 17, 19, 23, 29], True),
        ([23713, 57005, 43806, 48879], True),
        ([-2**63, 2**63 - 1, 0, -1, 1], True),
        ([2**64 - 1, 2**63, 2**62, 0], False),
        ([0] * 512 + [1] * 512, True),
        ([-2**63] * 4, True), ([2**63 - 1] * 700, True),
    ]
    # monotone runs with rare huge jumps (width-outlier split shapes)
    for _ in range(12):
        n = rng.randrange(2, 1200)
        vals = [rng.randrange(-10**12, 10**12)]
        for _ in range(n - 1):
            step = (rng.randrange(10**6, 10**9)
                    if rng.random() < 0.05 else rng.randrange(0, 50))
            vals.append(vals[-1] + step)
        cases.append((vals, True))
    # sorted-key wiggles at group boundaries
    for _ in range(12):
        n = rng.randrange(2, 600)
        vals, cur = [], rng.randrange(0, 10**9)
        while len(vals) < n:
            d = rng.choice([1, 2, 3, -1, 1000, 0])
            for _ in range(rng.randrange(1, 40)):
                vals.append(cur)
                cur += d
            cur += rng.choice([-10**7, 10**7, 5, -5])
        cases.append((vals[:n], True))
    # skewed (patched-base shapes)
    for _ in range(12):
        n = rng.randrange(13, 512)
        vals = [rng.randrange(0, 255) for _ in range(n)]
        for _ in range(rng.randrange(1, 6)):
            vals[rng.randrange(n)] = rng.randrange(2**20, 2**40)
        cases.append((vals, True))
    # random widths, signed and unsigned (incl. >2^62 unsigned)
    for _ in range(16):
        n = rng.randrange(1, 1500)
        w = rng.choice([1, 2, 4, 8, 16, 32, 53, 63, 64])
        vals = [rng.randrange(0, 2**w) for _ in range(n)]
        cases.append((vals, False))
        cases.append(([v - 2**(w - 1) for v in vals], True))
    # repeat mixtures (short-repeat / fixed-delta shapes)
    for _ in range(10):
        vals = []
        for _ in range(rng.randrange(1, 30)):
            vals += [rng.randrange(-10**6, 10**6)] * rng.randrange(1, 15)
        cases.append((vals, True))
    return cases


def test_rlev2_native_matches_numpy_bytes_and_info():
    for i, (vals, signed) in enumerate(_rlev2_cases()):
        ia: dict = {}
        ib: dict = {}
        a = rlev2.encode(vals, signed, ia)
        with numpy_only():
            b = rlev2.encode(vals, signed, ib)
        assert a == b, f"rlev2 case {i} (signed={signed}): native != numpy"
        assert ia == ib, f"rlev2 case {i}: info counts differ"
        if vals:
            dec = rlev2.decode(a, len(vals), signed)
            ref = np.asarray(vals, dtype=np.int64 if signed else np.uint64)
            assert (dec == ref).all(), f"rlev2 case {i}: decode"


def test_numpy_fallback_still_works():
    """GOORC_NATIVE=0-equivalent: the numpy path must stay functional."""
    data = b"fallback check " * 100
    with numpy_only():
        blob = fsst.compress(data)
        assert fsst.decompress(blob) == data
        enc = rlev2.encode([1, 2, 3, 4, 5, 100, 7], True)
        assert (rlev2.decode(enc, 7, True)
                == np.array([1, 2, 3, 4, 5, 100, 7])).all()


def test_rlev2_native_decode_matches_numpy():
    rng = random.Random(31)
    for i in range(40):
        n = rng.randrange(1, 2000)
        style = i % 4
        if style == 0:
            vals = [rng.randrange(-2**63, 2**63) for _ in range(n)]
        elif style == 1:
            vals = sorted(rng.randrange(0, 10**9) for _ in range(n))
        elif style == 2:
            vals = [rng.randrange(0, 256) for _ in range(n)]
            for _ in range(min(5, n)):
                vals[rng.randrange(n)] = rng.randrange(2**20, 2**45)
        else:
            vals = [rng.randrange(0, 2**64) for _ in range(n)]
        signed = style != 3
        enc = rlev2.encode(vals, signed)
        a = rlev2.decode(enc, n, signed)
        with numpy_only():
            b = rlev2.decode(enc, n, signed)
        assert (a == b).all(), f"decode case {i}"
        k = rng.randrange(1, n + 1)
        pa_ = rlev2.decode_prefix(enc, k, signed)
        with numpy_only():
            pb_ = rlev2.decode_prefix(enc, k, signed)
        assert (pa_ == pb_).all(), f"decode_prefix case {i}"


def test_rlev2_native_decode_truncated_falls_back_to_error():
    enc = rlev2.encode(list(range(100)), True)
    with pytest.raises(Exception):
        rlev2.decode(enc[:-3], 100, True)


def test_fsst_native_decompress_matches_numpy():
    rng = random.Random(8)
    cases = [b"", b"a", b"\xff" * 99, b"abcabc" * 3000]
    for _ in range(20):
        m = rng.randrange(1, 2000)
        cases.append(bytes(rng.choice(b"abcde \xff") for _ in range(m)))
    for i, data in enumerate(cases):
        blob = fsst.compress(data)
        a = fsst.decompress(blob)
        with numpy_only():
            b = fsst.decompress(blob)
        assert a == b == data, f"fsst decompress case {i}"
