#!/usr/bin/env python
"""Large-scale single-chip benchmark: synthetic COI-like DB at any size.

Companion to the repo-root `bench.py` (the driver entry point, default 65k
references): this script stress-tests the 10^5-10^6 reference range that is
the framework's headline scaling axis (BASELINE.md: queries/s/chip on a
1M-seq COI DB). Generation is fully vectorized so a 1M-record database
builds in ~3 minutes on a single-core host.

    python scripts/bench_scale.py --refs 1000000 --queries 2048
"""

from __future__ import annotations

import argparse
import sys
import time
from collections import deque
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ENC = np.array([1, 2, 4, 8], dtype=np.uint8)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--refs", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--batch-size", type=int, default=0)
    ap.add_argument("--seq-len", type=int, default=400)
    ap.add_argument("--families", type=int, default=4096)
    args = ap.parse_args()

    N, L, NFAM = args.refs, args.seq_len, args.families
    rng = np.random.default_rng(42)
    t0 = time.time()
    fam = rng.integers(0, 4, size=(NFAM, L), dtype=np.int8)
    mat = fam[np.arange(N) % NFAM]
    pos = rng.integers(0, L, size=(N, 30))
    np.put_along_axis(
        mat, pos, rng.integers(0, 4, size=(N, 30), dtype=np.int8), axis=1
    )
    seqs = list(ENC[mat])
    lineages = [
        f"p:P{i % 8},c:C{i % 64},o:O{i % 512},f:F{i % NFAM},"
        f"g:G{i % max(N // 8, 1)},s:S{i}"
        for i in range(N)
    ]
    print(f"generate: {time.time() - t0:.1f}s", flush=True)

    from raxtax_tpu.db.database import build_database
    from raxtax_tpu.engine.device import DeviceClassifier
    from raxtax_tpu.utils.jaxcfg import setup_jax

    setup_jax()
    t0 = time.time()
    db = build_database(lineages, seqs)
    print(f"build_database({N}): {time.time() - t0:.1f}s", flush=True)

    queries = []
    for i in range(args.queries):
        s = fam[i % NFAM].copy()
        p = rng.integers(0, L, 10)
        s[p] = rng.integers(0, 4, 10)
        queries.append((f"q{i}", ENC[s]))

    t0 = time.time()
    clf = DeviceClassifier.create(
        db, backend=args.backend, batch_size=args.batch_size or None
    )
    print(
        f"create(+HBM upload): {time.time() - t0:.1f}s "
        f"batch={clf.batch_size}", flush=True,
    )
    B = clf.batch_size
    t0 = time.time()
    clf._fb_dense = True
    clf.classify_batch(queries[:B])
    clf.classify_batch(queries[:B])
    print(f"warmup: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    done = 0
    prepared = deque()
    for lo in range(0, len(queries), B):
        a = clf.submit_batch(queries[lo : lo + B])
        if len(prepared) >= 2:
            for r in clf.finalize_batch(prepared.popleft()):
                r.out_string()
                done += 1
        prepared.append(clf.prepare_batch(a))
    while prepared:
        for r in clf.finalize_batch(prepared.popleft()):
            r.out_string()
            done += 1
    dt = time.time() - t0
    print(f"{N}-ref DB: {done} queries in {dt:.1f}s = {done / dt:.1f} q/s/chip")
    return 0


if __name__ == "__main__":
    sys.exit(main())
