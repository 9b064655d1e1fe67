"""Exact intersection-size histograms on the MXU.

The probability model needs, per query, the histogram of intersection sizes
over all references (reference: src/prob.rs:13-19). A naive compare-reduce is
O(B·N·S) on the VPU; instead we use an outer-product decomposition that runs
on the MXU: split the size ``s = 32·hi + lo`` and compute

    hist2[b, hi, lo] = Σ_n onehot_hi[b, hi, n] · onehot_lo[b, n, lo]

as a batched bf16 matmul with f32 accumulation — exact for histograms with
fewer than 2^24 entries per bucket.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

LO = 32


@partial(jax.jit, static_argnames=("s_max",))
def intersection_histogram(counts: jax.Array, s_max: int) -> jax.Array:
    """[B, N] integer-valued counts -> [B, s_max] int32 histogram.

    `s_max` must be a multiple of 32 and exceed the largest count.
    """
    assert s_max % LO == 0
    n_hi = s_max // LO
    c = counts.astype(jnp.int32)
    hi = c // LO  # [B, N]
    lo = c % LO
    hi_oh = (
        hi[:, None, :] == jnp.arange(n_hi, dtype=jnp.int32)[None, :, None]
    ).astype(jnp.bfloat16)  # [B, n_hi, N]
    lo_oh = (
        lo[:, :, None] == jnp.arange(LO, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.bfloat16)  # [B, N, LO]
    hist2 = jax.lax.dot_general(
        hi_oh,
        lo_oh,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, n_hi, LO]
    return hist2.reshape(c.shape[0], s_max).astype(jnp.int32)
