"""Probability-model tests.

Golden properties transcribed from src/prob.rs:208-235, plus cross-validation
of the vectorized/memoized fast path against the reference-structured oracle.
"""

import numpy as np
import pytest

from raxtax_tpu.prob.model import (
    KTableCache,
    build_k_tables,
    ln_binomial,
    normalized_size_probs,
    size_probs_from_hist,
)
from raxtax_tpu.prob.oracle import (
    _iterative_pmf_ln,
    highest_hit_prob_per_reference,
)


def closed_form_pmf(K, i, T, s, ln_z):
    # closed-form PMF from the reference test (src/prob.rs:182-207)
    if s == K:
        return 1.0 if i == T else 0.0
    if s == 0:
        return 1.0 if i == 0 else 0.0
    return float(
        np.exp(ln_binomial(s + i - 1, i) + ln_binomial((K - s) + (T - i) - 1, T - i) - ln_z)
    )


def test_pmf_vs_closed_form():
    # src/prob.rs:208-227 (K=200, T=32, s=50)
    K, T, s = 200, 32, 50
    ln_z = float(ln_binomial(K + T - 1, T))
    iterative = _iterative_pmf_ln(K, T, s, ln_z)
    closed = [closed_form_pmf(K, i, T, s, ln_z) for i in range(T + 1)]
    assert abs(sum(np.exp(p) for p in iterative) - 1.0) < 1e-7
    assert abs(sum(closed) - 1.0) < 1e-7
    for a, b in zip(iterative, closed):
        assert abs(np.exp(a) - b) < 1e-7
    # vectorized table row must match the scalar oracle exactly-ish
    t = build_k_tables(K, T)
    np.testing.assert_allclose(t.pmf_ln[s], iterative, rtol=1e-12, atol=1e-12)


def test_hit_prob_monotone_and_normalized():
    # src/prob.rs:229-235: probs over sizes 0..400 with K=400, T=200
    sizes = np.arange(401)
    probs = highest_hit_prob_per_reference(400, 200, sizes)
    assert abs(probs.sum() - 1.0) < 1e-7
    assert (np.diff(probs) >= 0).all()


def test_fast_path_matches_oracle():
    rng = np.random.default_rng(0)
    cache = KTableCache()
    for K in [5, 17, 64, 301]:
        T = K // 2
        sizes = rng.integers(0, K, size=200)  # no full match
        hist = np.bincount(sizes, minlength=K + 1)
        probs_size, probs_sum = normalized_size_probs(hist, K, cache)
        expected = highest_hit_prob_per_reference(K, T, sizes)
        got = probs_size[sizes]
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-300)


def test_full_match_fast_path():
    K = 40
    sizes = np.array([0, 3, 20, 40, 40])
    hist = np.bincount(sizes, minlength=K + 1)
    probs_size, _ = normalized_size_probs(hist, K)
    expected = highest_hit_prob_per_reference(K, K // 2, sizes)
    np.testing.assert_allclose(probs_size[sizes], expected, rtol=1e-12)
    # full matches dominate
    assert probs_size[40] > probs_size[20] > probs_size[3]
    assert probs_size[0] == 0.0


def test_memoization_shares_tables():
    cache = KTableCache(max_bytes=200_000)
    t1 = cache.get(33)
    t2 = cache.get(33)
    assert t1 is t2
    for k in range(40, 46):
        cache.get(k)
    # byte-bounded LRU: total stays under the cap, oldest entries evicted
    assert cache._bytes <= 200_000
    assert sum(
        cache._entry_bytes(t) for t in cache._cache.values()
    ) == cache._bytes
    assert 33 not in cache._cache


def test_k_zero_uniform():
    probs = size_probs_from_hist(np.array([7]), 0)
    assert probs.tolist() == [1.0]


@pytest.mark.parametrize("K", [1, 2, 3])
def test_tiny_k(K):
    sizes = np.zeros(5, dtype=int)
    hist = np.bincount(sizes, minlength=K + 1)
    probs_size, _ = normalized_size_probs(hist, K)
    expected = highest_hit_prob_per_reference(K, K // 2, sizes)
    np.testing.assert_allclose(probs_size[sizes], expected, rtol=1e-12)
