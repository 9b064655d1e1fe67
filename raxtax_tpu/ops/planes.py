"""Fused kernels over Harley-Seal counter planes.

The intersection kernel (ops/intersect_pallas.py) accumulates per-tip
intersection counts as *bit-sliced counter planes*: ``planes[b, p, s, lane]``
holds bit ``2^p`` of the count of tip ``n = (s*128 + lane)*32 + bit``. Round 1
expanded these planes into a dense ``[B, N] f32`` count matrix in HBM and ran
histogramming / probability-table gathers as separate XLA passes over it —
at the 1M-reference scale that materialized gigabytes of one-hot temporaries
per batch and set the throughput plateau (VERDICT round 1, item 1).

These kernels consume the planes directly, so the count matrix never exists:

- :func:`planes_histogram` — intersection-size histogram
  (reference: src/prob.rs:13-19) straight from the planes;
- :func:`planes_probs` — per-tip probability lookup
  ``probs[n] = table[b, count[n]]`` (reference: src/lineage.rs:62-67) as a
  fused decode + two-stage one-hot MXU gather, emitted in bit-major layout
  ``[B, 32, S, 128]`` (one cheap XLA transpose recovers tip order);
- :func:`planes_overflow` — the ``count > 15`` overflow values used by the
  compressed device->host wire format (ops/compress.py).

All three share the same decode: for each of the 32 bit positions of a plane
word, ``c = sum_p ((plane_p >> bit) & 1) << p`` — a handful of VPU ops per
word versus a full dense expansion.

Counts are bucketed with the same ``s = 32*hi + lo`` outer-product trick as
the round-1 XLA histogram, but on VMEM-resident tiles: one-hot hi/lo masks
contract on the MXU into a ``[n_hi, 32]`` accumulator that lives in scratch
across the whole reference axis. Exactness: every one-hot row selects at
most one 1.0, and bucket totals stay below 2^24, so f32 accumulation is
exact; ``precision=HIGHEST`` makes the MXU pass bit-exact for the f32 table
values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LO = 32  #: low-radix of the s = 32*hi + lo histogram split
WORD_BITS = 32


def _decode_bit(planes, bit: int, n_planes: int):
    """counts of the `bit`-th tip of each word: [S_t, 128] int32."""
    c = jnp.zeros_like(planes[0], dtype=jnp.int32)
    one = jnp.uint32(1)
    for p in range(n_planes):
        c = c | (((planes[p] >> jnp.uint32(bit)) & one) << p).astype(jnp.int32)
    return c


def _hist_kernel(n_planes: int, n_hi: int, s_total: int, st: int):
    def kernel(planes_ref, out_ref, acc):
        # planes_ref: [1, n_planes, st, 128] u32; out_ref: [1, n_hi, LO] f32
        # acc: VMEM [n_hi, LO] f32 histogram accumulator for query b
        t = pl.program_id(1)
        n_t = pl.num_programs(1)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        planes = [planes_ref[0, p] for p in range(n_planes)]
        # rows of the (ceil-divided) last tile that lie past the real plane
        # extent hold garbage: poison their counts so no one-hot matches
        row = jax.lax.broadcasted_iota(jnp.int32, (st, 128), 0)
        valid = (t * st + row) < s_total
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (n_hi, st, 128), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (LO, st, 128), 0)
        hist2 = acc[...]
        for bit in range(WORD_BITS):
            c = _decode_bit(planes, bit, n_planes)
            c = jnp.where(valid, c, -1)
            hi = c >> 5
            lo = c & 31
            a = (hi[None, :, :] == iota_hi).astype(jnp.float32)
            bm = (lo[None, :, :] == iota_lo).astype(jnp.float32)
            hist2 = hist2 + jax.lax.dot_general(
                a,
                bm,
                dimension_numbers=(((1, 2), (1, 2)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc[...] = hist2

        @pl.when(t == n_t - 1)
        def _():
            out_ref[0] = acc[...]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("s_max", "num_tips", "interpret")
)
def planes_histogram(
    planes: jax.Array,  # [B, P, S, 128] uint32 counter planes
    s_max: int,
    num_tips: int,
    interpret: bool = False,
) -> jax.Array:  # [B, s_max] int32
    """Exact intersection-size histogram from counter planes.

    `s_max` must be a multiple of 32 and exceed the largest count. Tips in
    [num_tips, S*128*32) are zero-padding; their spurious bucket-0 entries
    are subtracted here.
    """
    B, n_planes, S, lanes = planes.shape
    assert s_max % LO == 0
    n_hi = s_max // LO
    st = min(S, 256)
    n_t = pl.cdiv(S, st)
    hist2 = pl.pallas_call(
        _hist_kernel(n_planes, n_hi, S, st),
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(
                (1, n_planes, st, lanes),
                lambda b, t: (b, 0, t, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, n_hi, LO), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_hi, LO), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_hi, LO), jnp.float32)],
        interpret=interpret,
    )(planes)
    hist = hist2.reshape(B, s_max).astype(jnp.int32)
    pad = S * lanes * WORD_BITS - num_tips
    return hist.at[:, 0].add(-pad)


def _probs_kernel(n_planes: int, n_hi: int, s_total: int, st: int):
    def kernel(planes_ref, table_ref, out_ref):
        # planes_ref: [1, n_planes, st, 128] u32
        # table_ref:  [1, n_hi, LO] f32 (query b's per-size table, 2-D view)
        # out_ref:    [1, 32, st, 128] f32 (bit-major per-tip probabilities)
        t = pl.program_id(1)
        planes = [planes_ref[0, p] for p in range(n_planes)]
        table2d = table_ref[0]  # [n_hi, LO]
        row = jax.lax.broadcasted_iota(jnp.int32, (st, 128), 0)
        valid = (t * st + row) < s_total
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (n_hi, st, 128), 0)
        for bit in range(WORD_BITS):
            c = _decode_bit(planes, bit, n_planes)
            c = jnp.where(valid, c, -1)
            hi = c >> 5
            lo = c & 31
            # stage 1 (MXU): candidate row of the table per tip — exact,
            # since each one-hot column selects a single f32
            a = (hi[None, :, :] == iota_hi).astype(jnp.float32)
            cand = jax.lax.dot_general(
                table2d,
                a,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [LO, st, 128]
            # stage 2 (VPU): select within the 32-entry candidate row by a
            # 5-level binary multiplexer on lo's bits — 31 selects, exact
            sel = [cand[i] for i in range(LO)]
            level = 1
            while len(sel) > 1:
                bitmask = (lo & level) != 0
                sel = [
                    jnp.where(bitmask, sel[2 * i + 1], sel[2 * i])
                    for i in range(len(sel) // 2)
                ]
                level <<= 1
            out_ref[0, bit] = sel[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def planes_probs(
    planes: jax.Array,  # [B, P, S, 128] uint32
    table: jax.Array,  # [B, s_max] f32 per-size probabilities
    interpret: bool = False,
) -> jax.Array:  # [B, 32, S, 128] f32, bit-major
    """probs[b, bit, s, lane] = table[b, count of tip (s*128+lane)*32+bit].

    Out-of-table counts (garbage tile padding) produce 0.0. Use
    :func:`probs_to_tip_order` to recover the flat [B, N] layout.
    """
    B, n_planes, S, lanes = planes.shape
    s_max = table.shape[1]
    assert s_max % LO == 0
    n_hi = s_max // LO
    st = min(S, 256)
    n_t = pl.cdiv(S, st)
    return pl.pallas_call(
        _probs_kernel(n_planes, n_hi, S, st),
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(
                (1, n_planes, st, lanes),
                lambda b, t: (b, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_hi, LO),
                lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, WORD_BITS, st, lanes),
            lambda b, t: (b, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, WORD_BITS, S, lanes), jnp.float32),
        interpret=interpret,
    )(planes, table.reshape(B, n_hi, LO))


def probs_to_tip_order(probs_bitmajor: jax.Array, num_tips: int) -> jax.Array:
    """[B, 32, S, 128] bit-major probs -> [B, >=num_tips] in tip order.

    Tip n = (s*128 + lane)*32 + bit, so tip order is (s, lane, bit): one
    transpose. The tail past `num_tips` is zero-padding (zero-count tips get
    table[0] there, but no node range nor cumsum prefix below num_tips ever
    reads past it).
    """
    B = probs_bitmajor.shape[0]
    return probs_bitmajor.transpose(0, 2, 3, 1).reshape(B, -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def planes_high_counts(
    planes: jax.Array,  # [B, P, S, 128] uint32
    interpret: bool = False,
) -> jax.Array:  # [B, 32, S, 128] int32 bit-major counts, 0 where <= 15
    """Overflow counts (count > 15, else 0) in bit-major layout.

    Feeds the compressed wire format: the low nibble travels as the raw
    tier planes (ones/twos/fours/eights), the rare >15 counts as an
    index/value list extracted from this array.
    """
    B, n_planes, S, lanes = planes.shape
    st = min(S, 256)
    n_t = pl.cdiv(S, st)

    def kernel(planes_ref, out_ref):
        t = pl.program_id(1)
        planes_t = [planes_ref[0, p] for p in range(n_planes)]
        row = jax.lax.broadcasted_iota(jnp.int32, (st, 128), 0)
        valid = (t * st + row) < s_total_const
        for bit in range(WORD_BITS):
            c = _decode_bit(planes_t, bit, n_planes)
            c = jnp.where(valid & (c > 15), c, 0)
            out_ref[0, bit] = c

    s_total_const = S
    return pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(
                (1, n_planes, st, lanes),
                lambda b, t: (b, 0, t, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, WORD_BITS, st, lanes),
            lambda b, t: (b, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, WORD_BITS, S, lanes), jnp.int32),
        interpret=interpret,
    )(planes)
