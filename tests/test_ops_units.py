"""Unit tests for device op building blocks: exact table gather, threshold
compaction, and lossless count compression."""

import numpy as np
import pytest

import jax.numpy as jnp

from raxtax_tpu.ops.compress import compress_counts, decompress_rows
from raxtax_tpu.ops.nodeconf import compact_threshold, gather_table, threshold_set


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(9)


def test_gather_table_exact(rng):
    B, N, S = 8, 5000, 260
    counts = rng.integers(0, S, size=(B, N)).astype(np.float32)
    table = rng.random((B, S)).astype(np.float32)
    got = np.asarray(gather_table(jnp.asarray(counts), jnp.asarray(table)))
    want = np.take_along_axis(table, counts.astype(np.int64), axis=1)
    np.testing.assert_array_equal(got, want)


def test_compact_threshold_complete(rng):
    B, J, k = 4, 3000, 64
    conf = (rng.random((B, J)) * 0.01).astype(np.float32)
    vals, idx, n_sig = (
        np.asarray(x)
        for x in compact_threshold(jnp.asarray(conf), 0.0049, k)
    )
    for b in range(B):
        want = {(j, conf[b, j]) for j in np.nonzero(conf[b] >= 0.0049)[0]}
        assert n_sig[b] == len(want)
        m = min(int(n_sig[b]), k)
        got = {(int(idx[b, i]), vals[b, i]) for i in range(m)}
        assert got <= want and len(got) == m


def test_threshold_set_matches_topk_semantics(rng):
    B, J, k = 4, 2000, 32
    conf = (rng.random((B, J)) * 0.01).astype(np.float32)
    vals, idx, n_sig = (
        np.asarray(x) for x in threshold_set(jnp.asarray(conf), 0.0049, k)
    )
    for b in range(B):
        sig_j = set(np.nonzero(conf[b] >= 0.0049)[0])
        assert n_sig[b] == len(sig_j)
        m = min(int(n_sig[b]), k)
        assert {int(idx[b, i]) for i in range(m)} <= sig_j


def test_compress_roundtrip(rng):
    B, N, budget = 6, 4000, 16
    counts = rng.poisson(2.0, size=(B, N)).astype(np.float32)
    counts[0, rng.integers(0, N, 10)] = 300  # overflow entries
    counts[1, rng.integers(0, N, budget + 5)] = 77  # over budget
    parts = [
        np.asarray(x)
        for x in compress_counts(jnp.asarray(counts), budget=budget)
    ]
    rows, over = decompress_rows(*parts, rows=list(range(B)), num_tips=N, budget=budget)
    assert over == [1]  # only the over-budget row is inexact
    for b in range(B):
        if b in over:
            continue
        np.testing.assert_array_equal(rows[b], counts[b].astype(np.uint16))


def test_dd_cumsum_survives_compilation():
    """The TwoSum error-free transformation must not be optimized away by
    XLA (fast-math-style rewrites would silently zero the lo plane and
    invalidate every double-f32 margin bound)."""
    import jax
    import jax.numpy as jnp

    from raxtax_tpu.ops.nodeconf import tip_prob_cumsum_dd

    N = 4096
    probs = np.full((2, N), 2.0**-28, dtype=np.float32)
    probs[:, 0] = 1.0
    hi, lo = jax.jit(tip_prob_cumsum_dd)(jnp.asarray(probs))
    total = np.asarray(hi, np.float64)[:, -1] + np.asarray(lo, np.float64)[:, -1]
    exact = 1.0 + (N - 1) * 2.0**-28
    assert abs(total[0] - exact) < 1e-9
    # and a naive f32 scan genuinely loses the tiny terms on this input
    naive = float(np.cumsum(probs[0], dtype=np.float32)[-1])
    assert abs(naive - exact) > 1e-6


def test_compact_split_matches_full_compaction(rng):
    """_compact_split (single-tip nodes read probs[tip], inner nodes keep
    the boundary gathers) must select the same significant set as the full
    compaction, with hi+lo confidences equal to ~1 ulp (the tip path skips
    the dd subtraction, which only *removes* its ~2^-24 recovery error)."""
    import jax

    from raxtax_tpu.db.taxonomy import build_taxonomy
    from raxtax_tpu.ops.nodeconf import (
        _compact_dd_from_cum,
        _compact_split,
        node_conf_dd,
        tip_prob_cumsum_dd,
    )

    lineages = []
    for p in range(2):
        for f in range(3):
            for s in range(4):
                # one species has two records -> a multi-tip Taxon leaf
                reps = 2 if (p, f, s) == (0, 1, 2) else 1
                lineages.extend([f"p:P{p},f:F{p}_{f},s:S{p}_{f}_{s}"] * reps)
    # degenerate lineage: Sequence node spans its parent's whole range
    lineages.append("p:P2,f:F2_0,s:S2_0_0")
    lineages.sort()
    tax = build_taxonomy(lineages)
    ids = tax.eval_ids
    starts = jnp.asarray(tax.range_start[ids])
    ends = jnp.asarray(tax.range_end[ids])
    split = tuple(jnp.asarray(a) for a in tax.split_sig_arrays())

    B, k = 6, ids.shape[0]
    probs = rng.random((B, tax.num_tips), dtype=np.float32) * 0.05
    cum_hi, cum_lo = jax.jit(tip_prob_cumsum_dd)(jnp.asarray(probs))
    conf_hi, _ = node_conf_dd(cum_hi, cum_lo, starts, ends)
    w_vals, w_lo, w_idx, w_n = _compact_dd_from_cum(
        cum_hi, cum_lo, starts, ends, conf_hi, k
    )
    g_vals, g_lo, g_idx, g_n = _compact_split(
        cum_hi, cum_lo, jnp.asarray(probs), *split, k
    )
    np.testing.assert_array_equal(np.asarray(w_n), np.asarray(g_n))
    w_vals, w_lo, w_idx = map(np.asarray, (w_vals, w_lo, w_idx))
    g_vals, g_lo, g_idx = map(np.asarray, (g_vals, g_lo, g_idx))
    for b in range(B):
        want = {
            int(w_idx[b, j]): float(w_vals[b, j]) + float(w_lo[b, j])
            for j in range(int(w_n[b]))
        }
        got = {
            int(g_idx[b, j]): float(g_vals[b, j]) + float(g_lo[b, j])
            for j in range(int(g_n[b]))
        }
        assert set(want) == set(got)
        for n in want:
            assert abs(want[n] - got[n]) < 1e-6, (b, n)


def test_compact_dd_from_cum_matches_full_conf_lo(rng):
    """_compact_dd_from_cum (lo plane redone at selected indices only) must
    be bit-equal to the full-array _compact_dd it replaced in the
    single-chip significance paths."""
    import jax

    from raxtax_tpu.ops.nodeconf import (
        _compact_dd,
        _compact_dd_from_cum,
        node_conf_dd,
        tip_prob_cumsum_dd,
    )

    B, N, J, k = 4, 512, 96, 16
    probs = rng.random((B, N), dtype=np.float32) * 0.02
    starts = np.sort(rng.integers(0, N, size=J)).astype(np.int32)
    ends = np.minimum(starts + rng.integers(1, 40, size=J), N).astype(np.int32)
    cum_hi, cum_lo = jax.jit(tip_prob_cumsum_dd)(jnp.asarray(probs))
    s, e = jnp.asarray(starts), jnp.asarray(ends)
    conf_hi, conf_lo = node_conf_dd(cum_hi, cum_lo, s, e)
    want = _compact_dd(conf_hi, conf_lo, k)
    got = _compact_dd_from_cum(cum_hi, cum_lo, s, e, conf_hi, k)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
