"""Software-f64 arithmetic (ops/exactf64.py) vs real IEEE-754 float64.

The exact-scan pipeline's correctness rests entirely on f64_add/f64_sub
reproducing numpy's (= Rust's, = IEEE RN) results bit for bit, so these
fuzz millions of structured pairs: probability-scale values, equal/near
values (cancellation), zeros, huge exponent gaps (alignment + sticky),
and rounding-boundary patterns.
"""

from __future__ import annotations

import numpy as np
import pytest

from raxtax_tpu.ops.exactf64 import (
    f64_add,
    f64_le,
    f64_lt,
    f64_sub,
    f64_to_f32,
    join64_np,
    split64_np,
)


def _pairs(rng, n):
    """Adversarial non-negative normal/zero f64 pairs."""
    # broad magnitudes: exponents spanning the normal range
    e1 = rng.integers(-300, 300, n)
    e2 = e1 + rng.integers(-60, 60, n)  # mostly alignable gaps
    a = rng.random(n) * np.power(10.0, e1)
    b = rng.random(n) * np.power(10.0, e2)
    # structured slices
    k = n // 8
    b[:k] = a[:k]  # exact equality
    b[k : 2 * k] = np.nextafter(a[k : 2 * k], np.inf)  # 1-ulp apart
    b[2 * k : 3 * k] = a[2 * k : 3 * k] * 0.5  # Sterbenz zone
    a[3 * k : 4 * k] = 0.0  # zeros
    b[4 * k : 5 * k] = 0.0
    b[5 * k : 6 * k] = a[5 * k : 6 * k] * 2.220446049250313e-16  # ~ulp(a)
    # exact powers of two (rounding-boundary mantissas)
    a[6 * k : 7 * k] = np.power(
        2.0, rng.integers(-200, 200, k).astype(np.float64)
    )
    bad = ~np.isfinite(a) | ~np.isfinite(b)
    a[bad] = 1.0
    b[bad] = 1.0
    # contract: no subnormal inputs
    tiny = 2.2250738585072014e-308
    a[(a != 0) & (a < tiny)] = tiny
    b[(b != 0) & (b < tiny)] = tiny
    return a, b


@pytest.mark.parametrize("seed", [0])
def test_add_matches_numpy_fast(seed):
    rng = np.random.default_rng(seed)
    a, b = _pairs(rng, 30_000)
    keep = np.isfinite(a + b)
    a, b = a[keep], b[keep]
    ah, al = split64_np(a)
    bh, bl = split64_np(b)
    ch, cl = f64_add(ah, al, bh, bl)
    got = join64_np(np.asarray(ch), np.asarray(cl))
    assert (got == a + b).all()


@pytest.mark.heavy
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_add_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    a, b = _pairs(rng, 200_000)
    keep = np.isfinite(a + b)  # contract: no overflow to inf
    a, b = a[keep], b[keep]
    ah, al = split64_np(a)
    bh, bl = split64_np(b)
    ch, cl = f64_add(ah, al, bh, bl)
    got = join64_np(np.asarray(ch), np.asarray(cl))
    want = a + b
    mism = got != want
    assert not mism.any(), (
        f"{mism.sum()} mismatches; first: a={a[mism][0]!r} b={b[mism][0]!r} "
        f"got={got[mism][0]!r} want={want[mism][0]!r}"
    )


@pytest.mark.parametrize("seed", [3])
def test_sub_matches_numpy_fast(seed):
    rng = np.random.default_rng(seed)
    a, b = _pairs(rng, 30_000)
    hi = np.maximum(a, b)
    lo = np.minimum(a, b)
    ah, al = split64_np(hi)
    bh, bl = split64_np(lo)
    ch, cl = f64_sub(ah, al, bh, bl)
    got = join64_np(np.asarray(ch), np.asarray(cl))
    assert (got == hi - lo).all()


@pytest.mark.heavy
@pytest.mark.parametrize("seed", [3, 4, 5])
def test_sub_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    a, b = _pairs(rng, 200_000)
    hi = np.maximum(a, b)
    lo = np.minimum(a, b)
    ah, al = split64_np(hi)
    bh, bl = split64_np(lo)
    ch, cl = f64_sub(ah, al, bh, bl)
    got = join64_np(np.asarray(ch), np.asarray(cl))
    want = hi - lo
    mism = got != want
    assert not mism.any(), (
        f"{mism.sum()} mismatches; first: a={hi[mism][0]!r} "
        f"b={lo[mism][0]!r} got={got[mism][0]!r} want={want[mism][0]!r}"
    )


@pytest.mark.heavy
def test_sequential_scan_matches_numpy():
    """The actual use: a sequential prefix sum of probability-scale values
    must track numpy's running f64 bit for bit, including ties and zeros.
    (The tie-dense fast-tier coverage lives in tests/test_exactscan.py,
    which scans through the real lax.scan/kernel paths instead of this
    per-element eager loop.)"""
    rng = np.random.default_rng(9)
    for trial in range(20):
        n = 4096
        p = rng.random(n) * np.power(
            10.0, rng.integers(-12, 0, n).astype(np.float64)
        )
        p[rng.random(n) < 0.3] = 0.0
        # repeated identical values (tie-dense workloads)
        p[rng.random(n) < 0.3] = p[0]
        want = np.zeros(n)
        acc = 0.0
        for i in range(n):
            acc += p[i]
            want[i] = acc
        ph, plo = split64_np(p)
        ah = np.uint32(0)
        al = np.uint32(0)
        got = np.zeros(n)
        ch, cl = np.zeros(n, np.uint32), np.zeros(n, np.uint32)
        hi, lo = ah, al
        # vectorized emulation of the sequential loop via np (slow python
        # loop is fine at this size)
        for i in range(n):
            hi, lo = f64_add(
                np.atleast_1d(hi), np.atleast_1d(lo),
                np.atleast_1d(ph[i]), np.atleast_1d(plo[i]),
            )
            hi, lo = np.asarray(hi)[0], np.asarray(lo)[0]
            ch[i], cl[i] = hi, lo
        got = join64_np(ch, cl)
        np.testing.assert_array_equal(got, want)


def test_compare_and_f32():
    rng = np.random.default_rng(11)
    a, b = _pairs(rng, 50_000)
    ah, al = split64_np(a)
    bh, bl = split64_np(b)
    np.testing.assert_array_equal(np.asarray(f64_lt(ah, al, bh, bl)), a < b)
    np.testing.assert_array_equal(np.asarray(f64_le(ah, al, bh, bl)), a <= b)
    f32 = np.asarray(f64_to_f32(ah, al))
    # truncating conversion: within 1 ulp below the rounded f32
    exact = a.astype(np.float32)
    ok = (f32 == exact) | (
        np.nextafter(f32, np.float32(np.inf)) == exact
    )
    big = np.abs(a) > 1e38
    small = (a != 0) & (a < 1e-37)
    assert ok[~(big | small)].all()
