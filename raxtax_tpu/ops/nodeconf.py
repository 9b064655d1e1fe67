"""Node confidences, significance compaction, and the fallback descent.

The reference computes a per-query prefix sum of tip probabilities and walks
the pointer tree recursively (reference: src/lineage.rs:62-67, 114-179). On
device this becomes: gather per-tip probabilities from the per-size table,
one cumulative sum, two boundary gathers per eval node, and a top-k
compaction of nodes above the 2-decimal significance threshold. Only the
compacted (node, confidence) pairs cross back to the host; the per-tip
cumsum stays device-resident for the fallback descent.

The max-confidence fallback descent (src/lineage.rs:154-170) runs on device
too, as a `while_loop` over the global-node CSR child index, vectorized over
the batch of (query, start-node) pairs that need it. It operates in *global*
node space (not the eval view) because the reference's `max_by` ranges over
ALL children — including childless Sequence nodes, whose confidence is a
single-tip range sum. Ties pick the *last* maximal child, like Rust's
`Iterator::max_by`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

#: device-side significance threshold: raw confidence that could round to
#: >= 0.01 at 2 decimals, minus slack for f32 cumsum error. The host
#: re-rounds in f64 and prunes, so extras are harmless.
SIG_THRESHOLD = 0.005 - 1e-4


GATHER_CHUNK = 16384  #: tip columns per one-hot matmul step


def gather_table(counts: jax.Array, table: jax.Array) -> jax.Array:
    """probs[b, n] = table[b, counts[b, n]], exactly, on the MXU.

    A batched `take_along_axis` lowers to a generic gather that runs at
    ~300 MB/s on TPU; a one-hot contraction at `Precision.HIGHEST` (XLA's
    exact bf16x3 f32 emulation) is bit-exact — each output row of the one-hot
    product selects a single f32 — and ~8x faster. Chunked over tips via
    `lax.scan` so the one-hot never exceeds [B, CHUNK, S] in HBM.
    """
    B, N = counts.shape
    c = counts.astype(jnp.int32)
    pad = (-N) % GATHER_CHUNK
    if pad:
        c = jnp.pad(c, ((0, 0), (0, pad)))
    n_chunks = c.shape[1] // GATHER_CHUNK
    s_iota = jnp.arange(table.shape[1], dtype=jnp.int32)

    def step(carry, cchunk):  # cchunk: [B, CHUNK]
        oh = (cchunk[:, :, None] == s_iota[None, None, :]).astype(jnp.float32)
        p = jax.lax.dot_general(
            oh,
            table,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return carry, p

    cs = c.reshape(B, n_chunks, GATHER_CHUNK).transpose(1, 0, 2)
    _, ps = jax.lax.scan(step, 0, cs)
    return ps.transpose(1, 0, 2).reshape(B, -1)[:, :N]


def tip_prob_cumsum(counts: jax.Array, table: jax.Array) -> jax.Array:
    """[B, N+1] f32 zero-prefixed cumsum of per-tip probabilities.

    probs[b, n] = table[b, counts[b, n]] — the per-size probability of the
    intersection count of reference n (reference: src/lineage.rs:62-67).
    """
    probs = gather_table(counts, table)
    return jnp.pad(jnp.cumsum(probs, axis=1), ((0, 0), (1, 0)))


def compact_threshold(conf: jax.Array, threshold: float, k: int):
    """Sort-free threshold compaction: (vals [B,k], idx [B,k], n_sig [B]).

    `lax.top_k` lowers to a full sort on TPU — minutes of compile and O(J
    log J) run time at J ~ 10^6. The significant set only needs *all*
    entries above the threshold in any order, which a cumsum-rank scatter
    delivers in O(J): entry j with mask rank r < k lands in slot r. Entries
    beyond `n_sig > k` are dropped (callers re-run with a wider k).
    Padding slots hold idx -1 / val 0.
    """
    B, J = conf.shape
    mask = conf >= threshold
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    ok = mask & (rank < k)
    slot = jnp.where(ok, rank, k)
    rowid = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, J))
    nidx = jnp.broadcast_to(jnp.arange(J, dtype=jnp.int32)[None, :], (B, J))
    idx = (
        jnp.full((B, k + 1), -1, jnp.int32)
        .at[rowid, slot]
        .set(nidx, mode="drop")
    )
    vals = (
        jnp.zeros((B, k + 1), jnp.float32)
        .at[rowid, slot]
        .set(conf, mode="drop")
    )
    n_sig = mask.sum(axis=1).astype(jnp.int32)
    return vals[:, :k], idx[:, :k], n_sig


@partial(jax.jit, static_argnames=("top_k",))
def significant_nodes(
    counts: jax.Array,  # [B, N] f32 (exact integer intersection sizes)
    table: jax.Array,  # [B, S] f32 normalized per-size probabilities
    node_starts: jax.Array,  # [J] int32 eval-node range starts
    node_ends: jax.Array,  # [J] int32 eval-node range ends (exclusive)
    top_k: int = 1024,
):
    """Returns (conf_vals [B,k] f32, node_idx [B,k] i32, n_sig [B] i32,
    cum0 [B,N+1] device handle) — the top-k eval-node confidences above
    threshold plus the tip-probability cumsum for the fallback descent.

    `node_idx` indexes into the eval-node arrays; entries beyond `n_sig[b]`
    are padding.
    """
    cum0 = tip_prob_cumsum(counts, table)
    conf = cum0[:, node_ends] - cum0[:, node_starts]  # [B, J]
    k = min(top_k, conf.shape[1])
    vals, idx, n_sig = threshold_set(conf, SIG_THRESHOLD, k)
    return vals, idx, n_sig, cum0


#: above this eval-node count, switch from `lax.top_k` to the O(J) scatter
#: compaction. Measured on v5e: top_k runs 3-4x faster than the scatter up
#: through J ~ 1.3M (0.15s vs 0.54s at B=32) with a few-second compile, so
#: the cliff sits above any single-chip-resident database; the scatter path
#: guards the extreme tail.
TOPK_MAX_J = 1 << 21


def threshold_set(conf: jax.Array, threshold: float, k: int):
    """All above-threshold (value, index) pairs, k-bounded: size-adaptive
    between `lax.top_k` (faster at small J) and the scatter compaction."""
    if conf.shape[1] <= TOPK_MAX_J:
        masked = jnp.where(conf >= threshold, conf, -1.0)
        vals, idx = jax.lax.top_k(masked, k)
        n_sig = (conf >= threshold).sum(axis=1).astype(jnp.int32)
        return vals, idx.astype(jnp.int32), n_sig
    return compact_threshold(conf, threshold, k)


@partial(jax.jit, static_argnames=("chunk", "psum_axis", "vary_axes"))
def max_descent(
    cum0: jax.Array,  # [B, N+1] f32 tip-probability cumsum (local tips)
    b_idx: jax.Array,  # [M] int32 query index per descent
    start_nodes: jax.Array,  # [M] int32 GLOBAL node id to descend from
    range_start: jax.Array,  # [n_nodes] int32 (clipped to local tips if sharded)
    range_end: jax.Array,  # [n_nodes] int32
    child_ptr: jax.Array,  # [n_nodes+1] int32 CSR pointers (global nodes)
    child_ids: jax.Array,  # [C + chunk] int32, padded past C with 0
    node_is_inner: jax.Array,  # [n_nodes] bool
    chunk: int = 256,
    psum_axis: str | None = None,
    vary_axes: tuple[str, ...] = (),
):
    """Vectorized max-confidence descent; returns final GLOBAL node ids [M].

    Each (query, node) pair independently descends into the max-confidence
    child while the current node is Inner (src/lineage.rs:154-170). Children
    are scanned in id order in fixed-size chunks; within a chunk the *last*
    position attaining the max wins, and a later chunk replaces the carry on
    `>=` — together Rust `max_by` semantics. Under `shard_map`, pass
    `psum_axis` to merge per-shard partial range sums.
    """

    def _vary(x):
        # under shard_map the while carries must match the body's varying
        # manual axes (values derived from the data-sharded cumsum)
        return jax.lax.pcast(x, vary_axes, to="varying") if vary_axes else x

    def conf_of(b, ids):
        v = cum0[b, range_end[ids]] - cum0[b, range_start[ids]]
        if psum_axis is not None:
            v = jax.lax.psum(v, psum_axis)
        return v

    def argmax_child(b, node):
        lo = child_ptr[node]
        hi = child_ptr[node + 1]

        def chunk_body(state):
            off, best_val, best_id = state
            ids = jax.lax.dynamic_slice(child_ids, (off,), (chunk,))
            j = jnp.arange(chunk, dtype=jnp.int32)
            valid = (off + j) < hi
            vals = jnp.where(valid, conf_of(b, ids), -jnp.inf)
            cmax = vals.max()
            # last in-chunk position attaining cmax
            pos = jnp.max(jnp.where(vals == cmax, j, -1))
            cid = ids[pos]
            take = cmax >= best_val  # later chunk wins ties
            return (
                off + chunk,
                jnp.where(take, cmax, best_val),
                jnp.where(take, cid, best_id),
            )

        def chunk_cond(state):
            off, _, _ = state
            return off < hi

        _, _, best = jax.lax.while_loop(
            chunk_cond,
            chunk_body,
            (lo, _vary(jnp.float32(-jnp.inf)), _vary(jnp.int32(0))),
        )
        return best

    def descend(b, node):
        return jax.lax.while_loop(
            lambda n: node_is_inner[n],
            lambda n: argmax_child(b, n),
            _vary(node),
        )

    return jax.vmap(descend)(b_idx, start_nodes)
