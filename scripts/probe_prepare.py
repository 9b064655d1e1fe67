#!/usr/bin/env python
"""Fine-grained timing of the prepare/finalize sub-steps at bench scale.

diag_engine.py times whole phases; this breaks prepare_batch and
finalize_batch into their constituent costs (device sync points, host f64
prob model, dispatch overheads, native evaluation) so the optimization
target is a measured line, not a guess.

Usage: RAXTAX_BENCH_REFS=1000000 python scripts/probe_prepare.py
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
    from raxtax_tpu.engine.device import DeviceClassifier
    from raxtax_tpu.utils.jaxcfg import setup_jax

    setup_jax()
    n_refs = bench.CONFIGS[-1]
    fam, rng = bench.synth_fam()
    db = bench.get_database(n_refs, fam, rng)
    queries = bench.synth_queries(fam, 2048)
    clf = DeviceClassifier.create(
        db, backend=os.environ.get("RAXTAX_BENCH_BACKEND_DIAG", "pallas"),
        batch_size=bench.BATCH or None,
    )
    B = clf.batch_size
    log(f"backend={clf.backend} batch={B} refs={db.num_tips}")
    from raxtax_tpu.utils.encoding import sequence_to_kmers

    counts = [sequence_to_kmers(s).size for _, s in queries]
    clf.prewarm(int(max(counts)))
    t0 = time.time()
    clf.finalize_batch(clf.prepare_batch(clf.submit_batch(queries[:B])))
    clf.finalize_batch(clf.prepare_batch(clf.submit_batch(queries[B:2 * B])))
    log(f"warmup {time.time() - t0:.1f}s")

    import jax

    from raxtax_tpu.ops.compress import compress_planes
    from raxtax_tpu.prob.model import normalized_size_probs

    acc: dict[str, list[float]] = {}

    def t(name, fn, *a, **kw):
        t0 = time.time()
        out = fn(*a, **kw)
        acc.setdefault(name, []).append(time.time() - t0)
        return out

    for r in range(REPS):
        chunk = queries[(r % 8) * B : (r % 8) * B + B]
        state = t("A.submit_dispatch", clf.submit_batch, chunk)
        labels, seqs, exact, ks, s_max, n_real, counts_d, hist_dev = state
        t("B.fold+hist_device", jax.block_until_ready, hist_dev)
        # -- prepare pieces, serialized with explicit syncs --
        rows_pre = None
        if clf._planes_mode and not clf._mux_dense:
            rows_pre = ("planes",) + t(
                "C.compress_dispatch", compress_planes,
                counts_d, budget=clf._over_budget,
                interpret=clf._interpret, spread=clf._over_spread,
                layout=clf._layout,
            )
            t("D.compress_device", jax.block_until_ready, rows_pre[1])
        hist = t("E.hist_pull", np.array, hist_dev)

        def prob_stage():
            table = np.zeros((B, s_max), dtype=np.float32)
            tables64 = [None] * B
            gs = np.zeros(B, dtype=np.float64)
            inv_n = 1.0 / clf.db.num_tips
            for b in range(n_real):
                K = ks[b]
                ps, _ = normalized_size_probs(hist[b], K, clf._cache)
                h = hist[b, : ps.shape[0]].astype(np.float64)
                gs[b] = np.sqrt(h @ (ps - inv_n) ** 2)
                table[b, : ps.shape[0]] = ps
                tables64[b] = ps
            return table, tables64, gs

        table, tables64, gs = t("F.prob_model_host", prob_stage)
        sig = t(
            "G.significant_dispatch", clf._significant,
            counts_d, table, clf._top_k, rows_pre,
        )
        vals, vals_lo, idx, n_sig, cum0 = sig
        t("H.significance_device", jax.block_until_ready, vals)
        packed = t(
            "I.pack_dispatch", clf._pack_pull,
            vals, vals_lo, idx, n_sig, rows_pre,
        )
        t("J.pack_device+pull", np.asarray, packed)
        # -- finalize on a fresh, normally-prepared state --
        state2 = clf.submit_batch(chunk)
        p = clf.prepare_batch(state2)
        jax.block_until_ready(p[8])
        np.asarray(p[15])
        t("K.finalize_all", clf.finalize_batch, p)
    for k in sorted(acc):
        v = sorted(acc[k])
        log(
            f"{k:24s} median {v[len(v) // 2] * 1e3:7.1f} ms  "
            f"(min {v[0] * 1e3:.1f} max {v[-1] * 1e3:.1f})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
