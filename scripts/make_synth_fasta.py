#!/usr/bin/env python
"""Generate a synthetic COI-like reference FASTA for harness sweeps.

The reference harness samples real BOLD/SILVA exports; none are mounted in
this environment, so sweeps run on the same deterministic family-structured
synthetic workload as bench.py (consensus sequences per family + point
mutations, 6-level lineages with `tax=` annotations).

Usage: python scripts/make_synth_fasta.py N_RECORDS OUT.fasta [--seed 42]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int)
    ap.add_argument("out")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import bench

    bases = np.array(list("ACGT"))
    rng = np.random.default_rng(args.seed)
    fam = rng.integers(0, 4, size=(bench.N_FAMILIES, bench.SEQ_LEN))
    with open(args.out, "w") as f:
        for i in range(args.n):
            lineage = (
                f"p:P{i % 4},c:C{i % 16},o:O{i % 64},f:F{i % bench.N_FAMILIES},"
                f"g:G{i % (args.n // 8 or 1)},s:S{i}"
            )
            s = fam[i % bench.N_FAMILIES].copy()
            pos = rng.integers(0, bench.SEQ_LEN, size=30)
            s[pos] = rng.integers(0, 4, size=30)
            f.write(f">rec{i};tax={lineage};\n")
            f.write("".join(bases[s]) + "\n")
    print(f"wrote {args.n} records to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
