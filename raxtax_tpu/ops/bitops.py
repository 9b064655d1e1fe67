"""Bit-level device primitives shared by the compute paths."""

from __future__ import annotations

import jax
import jax.numpy as jnp

WORD_BITS = 32


def unpack_bits(words: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Unpack uint32 words into 0/1 values: [..., W] -> [..., W*32].

    Bit j of word w maps to output position w*32 + j (little-endian bit
    order, matching the host packers in db/bitmatrix.py).
    """
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)
    bits = (words[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*words.shape[:-1], words.shape[-1] * WORD_BITS).astype(dtype)


def popcount_u32(x: jax.Array) -> jax.Array:
    """SWAR population count per uint32 lane."""
    x = x.astype(jnp.uint32)
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24
