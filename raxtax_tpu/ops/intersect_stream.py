"""Streaming-scatter Pallas kernel: sequential postings stream + CSR scatter.

Third formulation of the intersection-count hot loop (reference:
src/raxtax.rs:58-64), designed around the measured hardware reality that
*sequential* HBM streaming is an order of magnitude faster than random row
gathers on this part:

- the kmer-major postings matrix `[65537+, S, 128]` is streamed exactly once
  per query batch through the BlockSpec pipeline (row blocks × ref-column
  tiles);
- a host-built CSR maps each streamed row block to the (query, row) pairs
  that consume it (pairs = sorted (kmer, query) of the batch);
- each consuming query folds the row into its per-query bit-plane counters
  (VMEM-resident, ripple-carry CSA) via a dynamic-bounds `fori_loop`.

Total HBM traffic is one pass over the matrix per batch — independent of the
query count — and all counter updates stay in VMEM. Ref columns are tiled so
that B × planes × tile fits VMEM; each tile re-reads only its own column
stripe of the stream, so traffic still totals one full pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_pallas import LANE, PAD_ROW, _planes_to_counts

ROW_BLOCK = 256  #: rows streamed per grid step
PAIR_BUCKET = 4096  #: pair-count padding granularity (bounds recompiles)


def _stream_kernel(n_planes: int, row_block: int, n_blocks: int):
    def kernel(pair_q, pair_row, block_ptr, rows_ref, out_ref):
        # out_ref doubles as the VMEM-resident accumulator: its block index
        # is constant across the row-block (minor) grid axis, so it stays in
        # VMEM until the tile finishes.
        i = pl.program_id(1)  # row-block index (minor)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        def body(j, _):
            q = pair_q[j]
            r = pair_row[j] - i * row_block
            carry = rows_ref[r]  # [S_t, 128]
            for p in range(n_planes):
                plane = out_ref[q, p, 0]
                out_ref[q, p, 0] = plane ^ carry
                carry = plane & carry
            return 0

        jax.lax.fori_loop(block_ptr[i], block_ptr[i + 1], body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("batch", "n_planes", "n_tiles", "interpret"),
)
def _stream_planes(
    pair_q: jax.Array,  # [n_pairs_pad] int32 query of each (kmer,query) pair
    pair_row: jax.Array,  # [n_pairs_pad] int32 row id, sorted ascending
    block_ptr: jax.Array,  # [n_blocks+1] int32 pair range per row block
    kmer_major: jax.Array,  # [n_rows_pad, S, 128] uint32
    batch: int,
    n_planes: int,
    n_tiles: int,
    interpret: bool = False,
) -> jax.Array:  # [B, n_planes, S, 128] uint32
    n_rows, sublanes, lanes = kmer_major.shape
    assert n_rows % ROW_BLOCK == 0 and sublanes % n_tiles == 0
    s_t = sublanes // n_tiles
    n_blocks = n_rows // ROW_BLOCK
    grid = (n_tiles, n_blocks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (ROW_BLOCK, s_t, lanes),
                lambda t, i, pq, pr, bp: (i, t, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (batch, n_planes, 1, s_t, lanes),
            lambda t, i, pq, pr, bp: (0, 0, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _stream_kernel(n_planes, ROW_BLOCK, n_blocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (batch, n_planes, n_tiles, s_t, lanes), jnp.uint32
        ),
        interpret=interpret,
    )(pair_q, pair_row, block_ptr, kmer_major)
    # [B, P, T, S_t, 128] -> [B, P, S, 128]
    return out.reshape(batch, n_planes, n_tiles * s_t, lanes)


def prepare_kmer_major_stream(db) -> jax.Array:
    """Device copy of the kmer-major matrix for streaming: lane-padded,
    tiled to [rows, Nw/128, 128], rows padded to a ROW_BLOCK multiple with
    zero rows (used as scatter no-op targets for pair padding)."""
    km = db.kmer_major
    # pad so the sublane count (Nw/128) is a multiple of 8: ref-column
    # tiles must be 8-sublane aligned for Mosaic
    pad = (-km.shape[1]) % (LANE * 8)
    if pad:
        km = np.pad(km, ((0, 0), (0, pad)))
    km = km.reshape(km.shape[0], -1, LANE)
    row_pad = (-km.shape[0]) % ROW_BLOCK
    if row_pad:
        km = np.pad(km, ((0, row_pad), (0, 0), (0, 0)))
    return jnp.asarray(km)


def build_pairs(kmer_idx: np.ndarray, n_rows_pad: int):
    """Host CSR prep: sorted (row, query) pairs + per-row-block pointers.

    `kmer_idx` is [B, K_pad] int32 padded with PAD_ROW; padded entries are
    redirected to the trailing zero rows (scatter no-ops).
    """
    B, k_pad = kmer_idx.shape
    rows = kmer_idx.reshape(-1).astype(np.int64)
    queries = np.repeat(np.arange(B, dtype=np.int32), k_pad)
    order = np.argsort(rows, kind="stable")
    rows = rows[order]
    queries = queries[order]
    # padded slots (PAD_ROW = 65536) land on the zero row at the end
    rows = np.where(rows >= PAD_ROW, n_rows_pad - 1, rows).astype(np.int32)
    n_pairs_pad = -(-rows.shape[0] // PAIR_BUCKET) * PAIR_BUCKET
    extra = n_pairs_pad - rows.shape[0]
    if extra:
        rows = np.pad(rows, (0, extra), constant_values=n_rows_pad - 1)
        queries = np.pad(queries, (0, extra))
    n_blocks = n_rows_pad // ROW_BLOCK
    bounds = np.arange(n_blocks + 1, dtype=np.int64) * ROW_BLOCK
    block_ptr = np.searchsorted(rows, bounds, side="left").astype(np.int32)
    return queries, rows, block_ptr


def pick_tiles(batch: int, n_planes: int, sublanes: int, vmem_budget: int = 9 << 20) -> int:
    """Smallest tile count so planes + stream buffers fit the VMEM budget."""
    for n_tiles in range(1, sublanes + 1):
        if sublanes % n_tiles:
            continue
        s_t = sublanes // n_tiles
        if s_t % 8 and n_tiles != 1:
            continue  # ref-column tiles must stay 8-sublane aligned
        need = (
            batch * n_planes * s_t * LANE * 4  # out block (= accumulator)
            + 2 * ROW_BLOCK * s_t * LANE * 4  # double-buffered stream block
        )
        if need <= vmem_budget:
            return n_tiles
    return 0  # no aligned tiling fits: caller must shrink the batch


def max_stream_batch(n_planes: int, vmem_budget: int = 9 << 20) -> int:
    """Largest per-call query batch that fits VMEM at the minimum (8-sublane)
    ref-column tile."""
    s_t = 8
    avail = vmem_budget - 2 * ROW_BLOCK * s_t * LANE * 4
    return max(8, (avail // (n_planes * s_t * LANE * 4)) // 8 * 8)


def intersection_planes_stream(
    kmer_idx: np.ndarray,  # [B, K_pad] int32, padded with PAD_ROW
    kmer_major: jax.Array,  # prepared by prepare_kmer_major_stream
    max_count: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:  # [B, n_planes, S, 128] uint32 counter planes
    """Counter planes from the streaming-scatter kernel.

    The binary counter planes (plane p = bit 2^p) are the SAME layout the
    Harley-Seal gather kernel emits, so every fused consumer in
    ops/planes.py (histogram, probs lookup, compress, row decode) works
    unchanged on top of this backend.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kmer_idx = np.asarray(kmer_idx)
    B, k_pad = kmer_idx.shape
    max_count = max_count if max_count is not None else k_pad
    n_planes = max(int(np.ceil(np.log2(max_count + 1))), 1)
    n_rows = kmer_major.shape[0]
    b_sub = min(B, max_stream_batch(n_planes))
    outs = []
    for lo in range(0, B, b_sub):
        chunk = kmer_idx[lo : lo + b_sub]
        if chunk.shape[0] < b_sub:
            chunk = np.pad(
                chunk,
                ((0, b_sub - chunk.shape[0]), (0, 0)),
                constant_values=PAD_ROW,
            )
        pair_q, pair_row, block_ptr = build_pairs(chunk, n_rows)
        n_tiles = pick_tiles(b_sub, n_planes, kmer_major.shape[1])
        assert n_tiles > 0
        outs.append(
            _stream_planes(
                jnp.asarray(pair_q),
                jnp.asarray(pair_row),
                jnp.asarray(block_ptr),
                kmer_major,
                batch=b_sub,
                n_planes=n_planes,
                n_tiles=n_tiles,
                interpret=interpret,
            )
        )
    planes = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return planes[:B]


def intersection_counts_stream(
    kmer_idx: np.ndarray,  # [B, K_pad] int32, padded with PAD_ROW
    kmer_major: jax.Array,  # prepared by prepare_kmer_major_stream
    num_tips: int,
    max_count: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:  # [B, num_tips] f32
    planes = intersection_planes_stream(
        kmer_idx, kmer_major, max_count, interpret
    )
    return _planes_to_counts(planes, num_tips)
