#!/usr/bin/env python
"""Per-kernel device-stage profile of the planes pipeline on the real chip.

Times each device stage of the single-chip pallas path separately at the
bench configuration (default 1M refs, B=128), with axon-aware sync (pull
one element, subtract the tunnel round-trip). Use it to decide which
kernel to attack next; run only when the tunnel is idle.

Usage: RAXTAX_BENCH_REFS=1000000 python scripts/profile_stages.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

REPS = int(os.environ.get("RAXTAX_PROFILE_REPS", 5))
RTT = 0.024  # tunnel sync round-trip to subtract


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def sync(x) -> None:
    """Force completion of the device queue up to x (axon-safe)."""
    arr = x
    while isinstance(arr, (tuple, list)):
        arr = arr[0]
    flat = arr.reshape(-1)[:1]
    np.asarray(flat)


def timeit(name: str, fn, *args):
    out = fn(*args)  # warm (compile)
    sync(out)
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        ts.append(time.time() - t0 - RTT)
    ts.sort()
    med = ts[len(ts) // 2]
    log(f"{name:34s} {med * 1e3:8.1f} ms")
    return name, med, out


def main() -> int:
    from raxtax_tpu.engine.device import DeviceClassifier
    from raxtax_tpu.utils.jaxcfg import setup_jax

    setup_jax()
    n_refs = bench.CONFIGS[-1]
    fam, rng = bench.synth_fam()
    db = bench.get_database(n_refs, fam, rng)
    queries = bench.synth_queries(fam, 256)
    clf = DeviceClassifier.create(
        db, backend="pallas", batch_size=bench.BATCH or None
    )
    B = clf.batch_size
    log(f"backend={clf.backend} batch={B} refs={db.num_tips}")

    # run two real batches first: fixes the sticky shape buckets and
    # compiles the full kernel set through the engine exactly as bench does
    t0 = time.time()
    clf.classify_batch(queries[:B])
    clf.classify_batch(queries[:B])
    log(f"engine warmup {time.time() - t0:.1f}s")

    import jax.numpy as jnp

    from raxtax_tpu.ops.compress import compress_planes
    from raxtax_tpu.ops.nodeconf import (
        node_conf_dd,
        significant_nodes_planes,
        threshold_set,
        tip_prob_cumsum_dd,
        SIG_THRESHOLD,
    )
    from raxtax_tpu.ops.planes import (
        planes_histogram,
        planes_probs,
        probs_to_tip_order,
    )
    from raxtax_tpu.utils.encoding import sequence_to_kmers

    kmer_sets = [sequence_to_kmers(s) for _, s in queries[:B]]
    k_pad = clf._k_pad_hw
    kmer_idx = np.full((B, k_pad), 0x10000, dtype=np.int32)
    for i, km in enumerate(kmer_sets):
        kmer_idx[i, : km.size] = km
    s_max = clf._s_max_hw
    table = np.random.default_rng(0).random((B, s_max), np.float32) * 1e-5

    results = {}

    from raxtax_tpu.ops.intersect_pallas import intersection_planes_pallas

    name, med, planes = timeit(
        "counts (gather+CSA planes)",
        lambda ki: intersection_planes_pallas(
            ki, clf.kmer_major, max_count=k_pad, interpret=clf._interpret
        ),
        jnp.asarray(kmer_idx),
    )
    results[name] = med

    if clf.kmer_major.ndim == 3:
        ks_arr = np.array([k.size for k in kmer_sets], np.int64)
        name, med, _ = timeit(
            "counts (gather+CSA, step-gated)",
            lambda ki: intersection_planes_pallas(
                ki, clf.kmer_major, max_count=k_pad,
                interpret=clf._interpret, kcounts=ks_arr,
            ),
            jnp.asarray(kmer_idx),
        )
        results[name] = med

    name, med, hist = timeit(
        "histogram (planes)",
        lambda p: planes_histogram(
            p, s_max, db.num_tips, interpret=clf._interpret
        ),
        planes,
    )
    results[name] = med
    del hist  # profiler holds >10 GB of stage outputs otherwise (OOM)

    name, med, wire = timeit(
        "compress (lo4+overflow wire)",
        lambda p: compress_planes(
            p, budget=clf._over_budget, interpret=clf._interpret,
            spread=clf._over_spread,
        ),
        planes,
    )
    results[name] = med
    del wire

    tbl = jnp.asarray(table)
    name, med, probs = timeit(
        "probs (low-bit mux + tip order)",
        lambda p, t: probs_to_tip_order(
            planes_probs(p, t, mux_bits=4, interpret=clf._interpret), 0
        ),
        planes, tbl,
    )
    results[name] = med

    # the engine's sticky dense-count mode (count>15 overflow beyond
    # budget) runs the FULL-WIDTH mux — 2^P-1 selects per word-bit
    for mb in (5, 6, None):
        n_planes = int(planes.shape[1])
        if mb is not None and mb >= n_planes:
            continue
        lbl = f"probs (mux_bits={mb if mb is not None else n_planes})"
        name, med, fw = timeit(
            lbl,
            lambda p, t, mb=mb: planes_probs(
                p, t, mux_bits=mb, interpret=clf._interpret
            ),
            planes, tbl,
        )
        results[name] = med
        del fw

    name, med, cums = timeit(
        "dd cumsum",
        lambda pr: tip_prob_cumsum_dd(pr, interpret=clf._interpret),
        probs,
    )
    results[name] = med
    cum_hi, cum_lo = cums
    del probs, cums

    # free the 1.6 GB plane set + cumsum before the fused variants: the
    # standalone [B, J] node-conf decomposition keeps four gather
    # temporaries live OUTSIDE a jit and OOMs a 16 GB chip at 1M refs —
    # the fused significance timings below cover those stages with XLA
    # managing liveness (their cost = fused total - probs - cumsum)
    del planes, cum_hi, cum_lo

    planes = intersection_planes_pallas(
        jnp.asarray(kmer_idx), clf.kmer_major, max_count=k_pad,
        interpret=clf._interpret,
    )

    name, med, sig = timeit(
        "significance (full fused jit)",
        lambda p, t: significant_nodes_planes(
            p, t, clf.node_starts, clf.node_ends, top_k=clf._top_k,
            interpret=clf._interpret,
        ),
        planes, tbl,
    )
    results[name] = med
    del sig

    # ---- variant matrix: the env-gated alternates, measured on the same
    # inputs so the defaults can be chosen from data -------------------
    # NOTE: the bm-scan variants are omitted — their in-VMEM
    # (32, rows//32, 128) -> (rows, 128) reorder is an unsupported
    # tpu.reshape on the current Mosaic toolchain (hardware compile error
    # at every tile size; interpret mode can't catch it)
    split = tuple(jnp.asarray(a) for a in db.taxonomy.split_sig_arrays())
    for label, bm, sp in (
        ("significance (split)", False, split),
    ):
        name, med, _ = timeit(
            label,
            lambda p, t, bm=bm, sp=sp: significant_nodes_planes(
                p, t, clf.node_starts, clf.node_ends, top_k=clf._top_k,
                interpret=clf._interpret, bm_scan=bm, split=sp,
            ),
            planes, tbl,
        )
        results[name] = med

    # block-sparse fold viability on this workload: pair statistics only
    # (the kernel itself is measured when the budget admits the workload)
    if clf._blk_ptr is not None:
        from raxtax_tpu.ops.intersect_pallas import build_pairs

        blk_ptr = np.asarray(clf._blk_ptr)
        c = (blk_ptr[kmer_idx + 1] - blk_ptr[kmer_idx]).sum(axis=1)
        S = clf.kmer_major.shape[1]
        budget = max(2048, k_pad * S // 24)
        log(
            f"sparse pairs/query: max {int(c.max())} mean {c.mean():.0f} "
            f"(budget {budget}, blocks {S // 8})"
        )
        res = build_pairs(kmer_idx, blk_ptr, np.asarray(clf._blk_ids), budget)
        if res is not None:
            from raxtax_tpu.ops.intersect_pallas import (
                intersection_planes_sparse,
            )

            pk, pb, mp, tot = res
            pad = (-pk.shape[1]) % 256
            pk = np.pad(pk, ((0, 0), (0, pad)), constant_values=0x10000)
            pb = np.pad(pb, ((0, 0), (0, pad)))
            name, med, _ = timeit(
                "counts (block-sparse fold)",
                lambda a, b: intersection_planes_sparse(
                    a, b, clf.kmer_major, max_count=k_pad,
                    interpret=clf._interpret, totals=tot,
                ),
                pk, pb,
            )
            results[name] = med

    print(json.dumps({k: round(v * 1e3, 1) for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
