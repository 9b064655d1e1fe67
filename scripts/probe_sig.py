#!/usr/bin/env python
"""Per-op device timing of the significance + compress stages at bench scale.

Times each kernel/op inside significant_nodes_planes (split2 path) and
compress_planes separately with block_until_ready, so the 193 ms (1M, B=256,
round-5 probe_prepare.py) significance stage decomposes into measured lines.

Usage: RAXTAX_BENCH_REFS=1000000 python scripts/probe_sig.py
"""

from __future__ import annotations

import logging
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

REPS = int(os.environ.get("RAXTAX_PROFILE_REPS", 4))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    import jax
    import jax.numpy as jnp

    from raxtax_tpu.engine.device import DeviceClassifier
    from raxtax_tpu.utils.jaxcfg import setup_jax

    setup_jax()
    n_refs = bench.CONFIGS[-1]
    fam, rng = bench.synth_fam()
    db = bench.get_database(n_refs, fam, rng)
    queries = bench.synth_queries(fam, 2048)
    clf = DeviceClassifier.create(db, backend="pallas",
                                  batch_size=bench.BATCH or None)
    B = clf.batch_size
    log(f"backend={clf.backend} batch={B} refs={db.num_tips} "
        f"layout={clf._layout}")
    from raxtax_tpu.utils.encoding import sequence_to_kmers

    kc = [sequence_to_kmers(s).size for _, s in queries]
    clf.prewarm(int(max(kc)))

    # one real batch through submit to get planes + table
    state = clf.submit_batch(queries[:B])
    labels, seqs, exact, ks, s_max, n_real, planes, hist_dev = state
    hist = np.array(hist_dev)
    from raxtax_tpu.prob.model import normalized_size_probs

    table = np.zeros((B, s_max), dtype=np.float32)
    for b in range(n_real):
        ps, _ = normalized_size_probs(hist[b], ks[b], clf._cache)
        table[b, : ps.shape[0]] = ps
    table_d = jax.device_put(jnp.asarray(table))
    jax.block_until_ready(table_d)
    del state, planes, hist_dev  # free the first batch's device arrays

    from raxtax_tpu.ops.compress import compress_planes
    from raxtax_tpu.ops.nodeconf import (
        SIG_THRESHOLD,
        _compact_unit_wide,
        _dd_add,
        _wide_conf_dd,
        threshold_set,
        threshold_set_tiled,
        tip_prob_cumsum_dd,
    )
    from raxtax_tpu.ops.planes import (
        planes_high_counts,
        planes_probs,
        probs_to_tip_order,
    )

    acc: dict[str, list[float]] = {}

    def t(name, fn, *a, **kw):
        t0 = time.time()
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        acc.setdefault(name, []).append(time.time() - t0)
        return out

    split2 = clf._split2
    use_sideband = split2 is not None and split2[4] is not None
    log(f"split2={'on' if split2 is not None else 'off'} "
        f"sideband={use_sideband} over_budget={clf._over_budget} "
        f"n_wide={0 if split2 is None else int(split2[0].shape[0])}")

    jp = jax.jit(planes_probs, static_argnames=("mux_bits", "interpret",
                                                "zero_high"))
    jcum = jax.jit(tip_prob_cumsum_dd, static_argnames=("interpret",))

    @jax.jit
    def wide_hi(cum_hi, ws, we):
        return cum_hi[:, we] - cum_hi[:, ws]

    @jax.jit
    def scatter_fix(probs, over_idx, fixv):
        rowid = jnp.broadcast_to(
            jnp.arange(probs.shape[0], dtype=jnp.int32)[:, None],
            over_idx.shape,
        )
        return probs.at[rowid, over_idx].set(
            fixv, mode="drop", unique_indices=True, indices_are_sorted=True
        )

    jthr_tiled = jax.jit(threshold_set_tiled,
                         static_argnames=("threshold", "k", "tile", "spread"))
    jthr = jax.jit(threshold_set, static_argnames=("threshold", "k", "spread"))
    jhigh = jax.jit(planes_high_counts, static_argnames=("interpret",))

    @jax.jit
    def mask_tips(probs2, has_unit):
        return jnp.where(has_unit[None, :], probs2, -1.0)

    for r in range(REPS + 1):
        fresh = r % 2 == 0  # alternate two batches to dodge result caching
        st2 = clf.submit_batch(queries[B : 2 * B] if fresh else queries[:B])
        planes = st2[6]
        jax.block_until_ready(planes)
        # --- compress pieces ---
        high_bm = t("c1.high_counts_kernel", jhigh, planes,
                    interpret=clf._interpret)
        high = high_bm.reshape(B, -1)
        budget = clf._over_budget
        vi = t("c2.over_extract_tiled", jthr_tiled,
               high.astype(jnp.float32), 16.0,
               min(budget, high.shape[1]), tile=128, spread=clf._over_spread)
        vals_c, idx_c, _ = vi
        sort_key = jnp.where(vals_c >= 16.0, idx_c, jnp.int32(2**30))

        @jax.jit
        def sort_pairs(sort_key, vals_c):
            order = jnp.argsort(sort_key, axis=1)
            return (jnp.take_along_axis(sort_key, order, axis=1),
                    jnp.take_along_axis(vals_c, order, axis=1))

        oi, ov = t("c3.over_argsort", sort_pairs, sort_key, vals_c)
        full = t("c0.compress_full", compress_planes, planes,
                 budget=budget, interpret=clf._interpret,
                 spread=clf._over_spread, layout=clf._layout)
        over_idx, over_val = full[1], full[2]

        # --- significance pieces ---
        probs_bm = t("s1.probs_mux4", jp, planes, table_d, mux_bits=4,
                     interpret=clf._interpret)
        probs = probs_bm.reshape(B, -1)
        fixv = jnp.where(
            over_idx < jnp.int32(2**30),
            jnp.take_along_axis(
                table_d,
                jnp.clip(over_val.astype(jnp.int32), 0,
                         table_d.shape[1] - 1), axis=1),
            0.0,
        )
        probs2 = t("s2.over_scatter", scatter_fix, probs, over_idx, fixv)
        del probs, probs_bm, high_bm, high, vals_c, idx_c, sort_key, oi, ov
        cum = t("s3.dd_cumsum", jcum, probs2, interpret=clf._interpret)
        cum_hi, cum_lo = cum
        if split2 is not None and split2[4] is not None:
            # engine's actual 1M path: zero_high mux + dd sideband scan +
            # bounds-histogram wide confs (no [B, N] scatter)
            @jax.jit
            def sideband_scan(fixv):
                ov_hi, ov_lo = jax.lax.associative_scan(
                    _dd_add, (fixv, jnp.zeros_like(fixv)), axis=1
                )
                pad = ((0, 0), (1, 0))
                return jnp.pad(ov_hi, pad), jnp.pad(ov_lo, pad)

            ovh, ovl = t("s2b.sideband_scan", sideband_scan, fixv)
            jwide = jax.jit(
                _wide_conf_dd, static_argnames=()
            )
            t("s4b.wide_conf_sideband", jwide, cum_hi, cum_lo,
              split2[0], split2[1], (over_idx, ovh, ovl),
              bounds_sorted=split2[4], start_rank=split2[5],
              end_rank=split2[6])
            del ovh, ovl
        if split2 is not None:
            ws, we = split2[0], split2[1]
            ch = t("s4.wide_hi_gathers", wide_hi, cum_hi, ws, we)
            k_w = min(clf._top_k, max(int(ws.shape[0]), 1))
            if ch.shape[1] > 2048:
                t("s5.wide_threshold", jthr_tiled, ch, SIG_THRESHOLD, k_w,
                  tile=512, spread=1)
            else:
                t("s5.wide_threshold", jthr, ch, SIG_THRESHOLD, k_w)
            has_unit = jnp.pad(
                split2[3].astype(jnp.bool_),
                (0, probs2.shape[1] - split2[3].shape[0]),
            )
            masked = t("s6.tip_mask", mask_tips, probs2, has_unit)
            k_t = min(clf._top_k, masked.shape[1])
            t("s7.tip_threshold_tiled", jthr_tiled, masked, SIG_THRESHOLD,
              k_t, tile=512, spread=1)
            del masked
        del probs2, cum, cum_hi, cum_lo, st2, fixv

    for k in sorted(acc):
        v = sorted(acc[k][1:]) or acc[k]  # drop the first (compile) rep
        log(f"{k:28s} median {v[len(v) // 2] * 1e3:7.1f} ms  "
            f"(min {v[0] * 1e3:.1f} max {v[-1] * 1e3:.1f} n={len(v)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
