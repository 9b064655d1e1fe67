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
from ..ops.nodeconf import (
    SIG_THRESHOLD,
    max_descent,
    threshold_set,
    tip_prob_cumsum,
)


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
        if d * m > n:
            # some environments pin the default platform to a single real
            # chip; honor an explicit larger mesh with the (virtual) CPU
            # backend when it has enough devices
            # (XLA_FLAGS=--xla_force_host_platform_device_count=N)
            try:
                cpu = jax.local_devices(backend="cpu")
            except RuntimeError:
                cpu = []
            if d * m <= len(cpu):
                devices, n = cpu, len(cpu)
        if d * m > n:
            raise ValueError(f"mesh {d}x{m} > {n} available devices")
        devices, n = devices[: d * m], d * m
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
    backend: str  #: counts kernel: "xla" (bit-matmul) or "pallas" (gather+CSA)
    ref_bits: jax.Array | None  #: [n_padded, 2048] u32, sharded over 'model'
    kmer_bits: jax.Array | None  #: [65537, n_padded/32] u32, cols over 'model'
    node_starts: jax.Array  #: [J] i32, replicated
    node_ends: jax.Array  #: [J] i32, replicated
    # fallback-descent state (global node space, replicated)
    dsc_range_start: jax.Array
    dsc_range_end: jax.Array
    dsc_child_ptr: jax.Array
    dsc_child_ids: jax.Array
    dsc_is_inner: jax.Array
    pad_node: int

    @classmethod
    def create(cls, db, mesh: Mesh, backend: str = "xla") -> "ShardedPipeline":
        from ..engine.device import descent_arrays

        tax = db.taxonomy
        model = mesh.shape["model"]
        ref_bits = kmer_bits = None
        if backend == "pallas":
            from ..ops.intersect_pallas import LANE

            # shard the kmer-major postings matrix by reference *words*:
            # each model shard owns a LANE-aligned block of reference columns
            km = pad_to_multiple(db.kmer_major, model * LANE, axis=1)
            kmer_bits = jax.device_put(
                km, NamedSharding(mesh, P(None, "model"))
            )
            n_padded = km.shape[1] * 32
        else:
            ref = pad_to_multiple(db.ref_major, model, axis=0)
            ref_bits = jax.device_put(
                ref, NamedSharding(mesh, P("model", None))
            )
            n_padded = ref.shape[0]
        repl = NamedSharding(mesh, P())
        eval_ids = tax.eval_ids
        ptr, ids, is_inner, pad_node = descent_arrays(tax)
        return cls(
            mesh=mesh,
            num_tips=db.num_tips,
            n_padded=n_padded,
            backend=backend,
            ref_bits=ref_bits,
            kmer_bits=kmer_bits,
            node_starts=jax.device_put(tax.range_start[eval_ids], repl),
            node_ends=jax.device_put(tax.range_end[eval_ids], repl),
            dsc_range_start=jax.device_put(tax.range_start, repl),
            dsc_range_end=jax.device_put(tax.range_end, repl),
            dsc_child_ptr=jax.device_put(ptr, repl),
            dsc_child_ids=jax.device_put(ids, repl),
            dsc_is_inner=jax.device_put(is_inner, repl),
            pad_node=pad_node,
        )

    @property
    def data_size(self) -> int:
        return self.mesh.shape["data"]

    # -- stage 1: counts + histogram ----------------------------------

    @partial(jax.jit, static_argnames=("self", "s_max"))
    def _counts_hist(self, query_bits, ref_bits, exact_ids, s_max: int):
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
        )(query_bits, ref_bits, exact_ids)

    @partial(jax.jit, static_argnames=("self", "s_max", "n_high", "interpret"))
    def _counts_hist_pallas(
        self, kmer_idx, kmer_bits, exact_ids, s_max: int, n_high: int,
        interpret: bool,
    ):
        from ..ops.intersect_pallas import LANE, _hs_planes, _planes_to_counts

        n_local = self.n_padded // self.mesh.shape["model"]

        def stage(kidx, km_l, ids):
            # local gather of this shard's postings columns + CSA fold:
            # each shard computes intersection counts for its own block of
            # references — no cross-shard traffic until the psum'ed histogram
            rows = km_l[kidx.reshape(-1)]  # [B_l*K, Nw_l]
            rows = rows.reshape(rows.shape[0], -1, LANE)
            planes = _hs_planes(
                rows, batch=kidx.shape[0], n_high=n_high, interpret=interpret
            )
            counts = _planes_to_counts(planes, n_local)  # [B_l, n_local]
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
            in_specs=(P("data", None), P(None, "model"), P("data", None)),
            out_specs=(P("data", "model"), P("data", None)),
            # pallas_call's out_shape has no varying-axes annotation; the
            # explicit psum above is the only collective in this stage
            check_vma=False,
        )(kmer_idx, kmer_bits, exact_ids)

    def counts_and_hist(
        self,
        query_bits: np.ndarray,
        exact_ids: np.ndarray,
        s_max: int,
        kmer_idx: np.ndarray | None = None,
    ):
        """Returns (counts device handle, hist device handle [B, s_max]).

        Async: nothing is forced to host here, so the caller can overlap this
        batch's device compute with another batch's host stages. Bucket 0 of
        the histogram still includes the padded reference rows; the caller
        subtracts `n_padded - num_tips` after pulling it.
        """
        data = NamedSharding(self.mesh, P("data", None))
        ids = jax.device_put(exact_ids, data)
        if self.backend == "pallas":
            k_pad = kmer_idx.shape[1]
            n_high = max(int(np.ceil(np.log2(k_pad + 1))) - 4, 1)
            # interpret mode follows the MESH devices (which may be the
            # virtual CPU backend even when the default platform is a chip)
            interpret = self.mesh.devices.flat[0].platform != "tpu"
            kidx = jax.device_put(kmer_idx, data)
            return self._counts_hist_pallas(
                kidx, self.kmer_bits, ids, s_max, n_high, interpret
            )
        qb = jax.device_put(query_bits, data)
        return self._counts_hist(qb, self.ref_bits, ids, s_max)

    # -- stage 2: significance compaction ------------------------------

    @partial(jax.jit, static_argnames=("self", "top_k"))
    def _significant(self, counts, table, starts, ends, top_k: int):
        n_local = self.n_padded // self.mesh.shape["model"]

        def stage(counts_l, table_l):
            cum0 = tip_prob_cumsum(counts_l, table_l)  # [B_l, N_l+1]
            lo = jax.lax.axis_index("model") * n_local
            s = jnp.clip(starts - lo, 0, n_local)
            e = jnp.clip(ends - lo, 0, n_local)
            conf = jax.lax.psum(cum0[:, e] - cum0[:, s], "model")
            k = min(top_k, conf.shape[1])
            vals, idx, n_sig = threshold_set(conf, SIG_THRESHOLD, k)
            return vals, idx, n_sig, cum0

        return jax.shard_map(
            stage,
            mesh=self.mesh,
            in_specs=(P("data", "model"), P("data", None)),
            out_specs=(
                P("data", None),
                P("data", None),
                P("data"),
                P("data", "model"),
            ),
        )(counts, table)

    def significant(self, counts, table: np.ndarray, top_k: int):
        """Async: returns device handles (vals, idx, n_sig, cum0)."""
        tbl = jax.device_put(
            table, NamedSharding(self.mesh, P("data", None))
        )
        return self._significant(
            counts, tbl, self.node_starts, self.node_ends, top_k
        )

    # -- stage 3: fallback descents -------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _descend(self, cum0, b_arr, start_arr, rs, re, child_ptr, child_ids,
                 is_inner):
        n_local = self.n_padded // self.mesh.shape["model"]

        def stage(cum0_l, b_arr, start_arr):
            # Each data shard runs every descent redundantly (M is tiny):
            # non-owned rows use a clamped local query index, producing a
            # terminating-but-garbage walk whose result is masked out; the
            # psum over 'data' then leaves exactly the owner's answer.
            b_local = cum0_l.shape[0]
            d = jax.lax.axis_index("data")
            local_b = b_arr - d * b_local
            owned = (local_b >= 0) & (local_b < b_local)
            lb = jnp.clip(local_b, 0, b_local - 1)
            lo = jax.lax.axis_index("model") * n_local
            s = jnp.clip(rs - lo, 0, n_local)
            e = jnp.clip(re - lo, 0, n_local)
            finals = max_descent(
                cum0_l,
                lb,
                start_arr,
                s,
                e,
                child_ptr,
                child_ids,
                is_inner,
                psum_axis="model",
                vary_axes=("data",),
            )
            return jax.lax.psum(jnp.where(owned, finals, 0), "data")

        return jax.shard_map(
            stage,
            mesh=self.mesh,
            in_specs=(P("data", "model"), P(), P()),
            out_specs=P(),
        )(cum0, b_arr, start_arr)

    def descend(
        self, cum0, b_arr: np.ndarray, start_arr: np.ndarray
    ) -> np.ndarray:
        repl = NamedSharding(self.mesh, P())
        return np.asarray(
            self._descend(
                cum0,
                jax.device_put(b_arr, repl),
                jax.device_put(start_arr, repl),
                self.dsc_range_start,
                self.dsc_range_end,
                self.dsc_child_ptr,
                self.dsc_child_ids,
                self.dsc_is_inner,
            )
        )
