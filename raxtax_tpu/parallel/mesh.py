"""Device meshes and the sharded classification pipeline.

The reference scales with a rayon work-stealing pool on one CPU
(reference: src/raxtax.rs:36-37, SURVEY.md §2 parallelism inventory). The
TPU-native dual is a 2-D `jax.sharding.Mesh`:

- ``data`` axis: query batches are data-parallel (the reference's only
  parallelism strategy);
- ``model`` axis: the reference k-mer presence bit matrix — the "model" of
  this framework — is sharded by reference rows (tensor parallelism). Each
  shard computes partial intersection counts/histograms/node confidences;
  partials merge with `psum` over ICI.

Everything runs under `jax.shard_map` with the compute kernels unchanged
from the single-device path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.histogram import intersection_histogram
from ..ops.intersect_xla import intersection_counts_xla
from ..ops.nodeconf import SIG_THRESHOLD


def make_mesh(spec: str = "", devices=None) -> Mesh:
    """Create a ('data', 'model') mesh.

    `spec` is "<data>,<model>" (e.g. "2,4"); empty puts all devices on the
    model axis (database sharding), the right default when the DB dominates
    HBM.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if spec:
        d, m = (int(x) for x in spec.split(","))
        if d * m != n:
            raise ValueError(f"mesh {d}x{m} != {n} available devices")
    else:
        d, m = 1, n
    dev_array = np.asarray(devices).reshape(d, m)
    return Mesh(dev_array, ("data", "model"))


def pad_to_multiple(arr: np.ndarray, m: int, axis: int = 0) -> np.ndarray:
    n = arr.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths)


@dataclass(eq=False)
class ShardedPipeline:
    """Mesh-parallel count/histogram/aggregation stages.

    Holds the device-resident sharded database state; per-batch methods mirror
    the single-device pipeline in engine/device.py.
    """

    mesh: Mesh
    num_tips: int
    n_padded: int
    ref_bits: jax.Array  #: [n_padded, 2048] u32, sharded over 'model'
    node_starts: jax.Array  #: [J] i32, replicated
    node_ends: jax.Array  #: [J] i32, replicated

    @classmethod
    def create(cls, db, mesh: Mesh) -> "ShardedPipeline":
        tax = db.taxonomy
        model = mesh.shape["model"]
        ref = pad_to_multiple(db.ref_major, model, axis=0)
        ref_bits = jax.device_put(
            ref, NamedSharding(mesh, P("model", None))
        )
        repl = NamedSharding(mesh, P())
        eval_ids = tax.eval_ids
        return cls(
            mesh=mesh,
            num_tips=db.num_tips,
            n_padded=ref.shape[0],
            ref_bits=ref_bits,
            node_starts=jax.device_put(tax.range_start[eval_ids], repl),
            node_ends=jax.device_put(tax.range_end[eval_ids], repl),
        )

    @property
    def data_size(self) -> int:
        return self.mesh.shape["data"]

    # -- stage 1: counts + histogram ----------------------------------

    @partial(jax.jit, static_argnames=("self", "s_max"))
    def _counts_hist(self, query_bits, exact_ids, s_max: int):
        n_local = self.n_padded // self.mesh.shape["model"]

        def stage(qb, rb, ids):
            counts = intersection_counts_xla(
                qb, rb, vary_axes=("data", "model")
            )  # [B_l, N_l]
            lo = jax.lax.axis_index("model") * n_local
            ref_idx = lo + jnp.arange(n_local, dtype=jnp.int32)
            hit = (ref_idx[None, None, :] == ids[:, :, None]).any(axis=1)
            counts = jnp.where(hit, 0.0, counts)
            hist = jax.lax.psum(
                intersection_histogram(counts, s_max), "model"
            )
            return counts, hist

        return jax.shard_map(
            stage,
            mesh=self.mesh,
            in_specs=(P("data", None), P("model", None), P("data", None)),
            out_specs=(P("data", "model"), P("data", None)),
        )(query_bits, self.ref_bits, exact_ids)

    def counts_and_hist(self, query_bits: np.ndarray, exact_ids: np.ndarray, s_max: int):
        """Returns (counts device handle, hist np [B, s_max] with pad rows
        corrected out of bucket 0)."""
        qb = jax.device_put(
            query_bits, NamedSharding(self.mesh, P("data", None))
        )
        ids = jax.device_put(
            exact_ids, NamedSharding(self.mesh, P("data", None))
        )
        counts, hist = self._counts_hist(qb, ids, s_max)
        hist = np.array(hist)  # writable copy
        hist[:, 0] -= self.n_padded - self.num_tips  # padded refs count as 0
        return counts, hist

    # -- stage 2: significance compaction ------------------------------

    @partial(jax.jit, static_argnames=("self", "top_k"))
    def _significant(self, counts, table, top_k: int):
        n_local = self.n_padded // self.mesh.shape["model"]
        starts, ends = self.node_starts, self.node_ends

        def stage(counts_l, table_l):
            probs = jnp.take_along_axis(
                table_l, counts_l.astype(jnp.int32), axis=1
            )
            cum0 = jnp.pad(jnp.cumsum(probs, axis=1), ((0, 0), (1, 0)))
            lo = jax.lax.axis_index("model") * n_local
            s = jnp.clip(starts - lo, 0, n_local)
            e = jnp.clip(ends - lo, 0, n_local)
            conf = jax.lax.psum(cum0[:, e] - cum0[:, s], "model")
            sig = conf >= SIG_THRESHOLD
            n_sig = sig.sum(axis=1).astype(jnp.int32)
            masked = jnp.where(sig, conf, -1.0)
            k = min(top_k, conf.shape[1])
            vals, idx = jax.lax.top_k(masked, k)
            return vals, idx.astype(jnp.int32), n_sig, conf

        return jax.shard_map(
            stage,
            mesh=self.mesh,
            in_specs=(P("data", "model"), P("data", None)),
            out_specs=(
                P("data", None),
                P("data", None),
                P("data"),
                P("data", None),
            ),
        )(counts, table)

    def significant(self, counts, table: np.ndarray, top_k: int):
        tbl = jax.device_put(
            table, NamedSharding(self.mesh, P("data", None))
        )
        vals, idx, n_sig, conf = self._significant(counts, tbl, top_k)
        return np.asarray(vals), np.asarray(idx), np.asarray(n_sig), conf
