"""Node confidences, significance compaction, and the fallback descent.

The reference computes a per-query prefix sum of tip probabilities and walks
the pointer tree recursively (reference: src/lineage.rs:62-67, 114-179). On
device this becomes: gather per-tip probabilities from the per-size table,
one cumulative sum, two boundary gathers per eval node, and a top-k
compaction of nodes above the 2-decimal significance threshold. Only the
compacted (node, confidence) pairs cross back to the host.

The max-confidence fallback descent (src/lineage.rs:154-170) runs here too,
as a masked `while_loop` over a CSR child index, vectorized over the batch of
(query, start-node) pairs that need it. Ties pick the *last* maximal child,
like Rust's `Iterator::max_by`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

#: device-side significance threshold: raw confidence that could round to
#: >= 0.01 at 2 decimals, minus slack for f32 cumsum error. The host
#: re-rounds in f64 and prunes, so extras are harmless.
SIG_THRESHOLD = 0.005 - 1e-4


@partial(jax.jit, static_argnames=("top_k",))
def significant_nodes(
    counts: jax.Array,  # [B, N] f32 (exact integer intersection sizes)
    table: jax.Array,  # [B, S] f32 normalized per-size probabilities
    node_starts: jax.Array,  # [J] int32 eval-node range starts
    node_ends: jax.Array,  # [J] int32 eval-node range ends (exclusive)
    top_k: int = 1024,
):
    """Returns (conf_vals [B,k] f32, node_idx [B,k] i32, n_sig [B] i32,
    node_conf_handle) — the top-k eval-node confidences above threshold.

    `node_idx` indexes into the eval-node arrays; entries beyond `n_sig[b]`
    are padding. `node_conf_handle` is the full [B, J] confidence matrix,
    kept on device for the fallback descent.
    """
    probs = jnp.take_along_axis(table, counts.astype(jnp.int32), axis=1)
    cum = jnp.cumsum(probs, axis=1)
    cum0 = jnp.pad(cum, ((0, 0), (1, 0)))
    conf = cum0[:, node_ends] - cum0[:, node_starts]  # [B, J]
    sig = conf >= SIG_THRESHOLD
    n_sig = sig.sum(axis=1).astype(jnp.int32)
    masked = jnp.where(sig, conf, -1.0)
    k = min(top_k, conf.shape[1])
    vals, idx = jax.lax.top_k(masked, k)
    return vals, idx.astype(jnp.int32), n_sig, conf


@partial(jax.jit, static_argnames=("chunk",))
def max_descent(
    node_conf: jax.Array,  # [B, J] f32 eval-node confidences
    b_idx: jax.Array,  # [M] int32 query index per descent
    start_nodes: jax.Array,  # [M] int32 eval-node index to descend from
    child_ptr: jax.Array,  # [J+1] int32 CSR pointers (eval-node children)
    child_ids: jax.Array,  # [C + chunk] int32, padded with J (sentinel)
    node_is_inner: jax.Array,  # [J] bool
    chunk: int = 128,
):
    """Vectorized max-confidence descent; returns final eval-node ids [M].

    Each (query, node) pair independently descends into the max-confidence
    child while the current node is Inner. Children are scanned in id order
    in fixed-size chunks; ties keep the later child (Rust max_by semantics:
    `>=` replacement on an ascending scan).
    """

    def argmax_child(b, node):
        lo = child_ptr[node]
        hi = child_ptr[node + 1]

        def chunk_body(state):
            off, best_val, best_id = state

            ids = jax.lax.dynamic_slice(child_ids, (off,), (chunk,))
            j = off + jnp.arange(chunk, dtype=jnp.int32)
            valid = j < hi
            vals = jnp.where(valid, node_conf[b, ids], -jnp.inf)

            def scan_step(carry, x):
                bv, bi = carry
                v, i = x
                take = v >= bv  # later index wins ties
                return (
                    jnp.where(take, v, bv),
                    jnp.where(take, i, bi),
                ), None

            (best_val, best_id), _ = jax.lax.scan(
                scan_step, (best_val, best_id), (vals, ids)
            )
            return off + chunk, best_val, best_id

        def chunk_cond(state):
            off, _, _ = state
            return off < hi

        _, _, best = jax.lax.while_loop(
            chunk_cond, chunk_body, (lo, -jnp.inf, jnp.int32(0))
        )
        return best

    def descend(b, node):
        def cond(n):
            return node_is_inner[n]

        def body(n):
            return argmax_child(b, n)

        return jax.lax.while_loop(cond, body, node)

    return jax.vmap(descend)(b_idx, start_nodes)
