#!/usr/bin/env python
"""Mosaic support probe for the software-f64 ops (round-5 exact-scan plan).

Compiles three tiny kernels on the real chip BEFORE any engine work builds
on them (round-3 lesson: interpret mode accepts programs Mosaic rejects):
  1. elementwise f64_add / f64_sub on u32 pairs (vector-amount shifts,
     u32 adds/compares/popcount),
  2. a sequential per-tip scan with dynamic sublane indexing and a VMEM
     carry — the exact_cumsum kernel's core loop structure,
  3. timing of the scan at bench-like shapes (65k and 1M tips, B=256).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from raxtax_tpu.utils.jaxcfg import setup_jax  # noqa: E402

setup_jax()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from raxtax_tpu.ops.exactf64 import (  # noqa: E402
    f64_add,
    f64_sub,
    join64_np,
    split64_np,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> int:
    log(f"devices: {jax.devices()}")

    # --- 1. elementwise add/sub kernel -------------------------------
    def ew_kernel(ah, al, bh, bl, oh, ol, sh, sl):
        ch, cl = f64_add(ah[...], al[...], bh[...], bl[...])
        oh[...] = ch
        ol[...] = cl
        dh, dl = f64_sub(ch, cl, bh[...], bl[...])
        sh[...] = dh
        sl[...] = dl

    rng = np.random.default_rng(0)
    n = 8 * 128
    a = rng.random(n) * 10.0 ** rng.integers(-30, 2, n)
    b = rng.random(n) * 10.0 ** rng.integers(-30, 2, n)
    ah, al = split64_np(a)
    bh, bl = split64_np(b)
    shp = (8, 128)
    outs = pl.pallas_call(
        ew_kernel,
        out_shape=[jax.ShapeDtypeStruct(shp, jnp.uint32)] * 4,
    )(*(x.reshape(shp) for x in (ah, al, bh, bl)))
    oh, ol, sh, sl = (np.asarray(o).reshape(-1) for o in outs)
    got_add = join64_np(oh, ol)
    want_add = a + b
    assert (got_add == want_add).all(), "elementwise add mismatch on chip"
    got_sub = join64_np(sh, sl)
    want_sub = want_add - b
    assert (got_sub == want_sub).all(), "elementwise sub mismatch on chip"
    log("1. elementwise f64_add/f64_sub kernel: OK (bit-exact)")

    # --- 2+3. sequential scan kernel ---------------------------------
    # Layout [N, G, 128]: tips major, queries = G lane-groups of 128.
    # The kernel walks 8-tip vreg-aligned blocks (dynamic sublane slices
    # at unaligned offsets made the first cut 50x slower than the math),
    # unrolling the 8 sequential adds over STATIC sublane rows.
    def make_scan(tblk):
        nblk = tblk // 8

        def scan_kernel(ph_ref, pl_ref, oh_ref, ol_ref, ch_ref, cl_ref):
            t = pl.program_id(1)

            @pl.when(t == 0)
            def _():
                ch_ref[...] = jnp.zeros_like(ch_ref)
                cl_ref[...] = jnp.zeros_like(cl_ref)

            def body(i, carry):
                hi, lo = carry  # [1, 128] each
                xh = ph_ref[0, pl.ds(i * 8, 8)]  # [8, 128] aligned
                xl = pl_ref[0, pl.ds(i * 8, 8)]
                outs_h = []
                outs_l = []
                for j in range(8):
                    hi, lo = f64_add(
                        hi, lo, xh[j : j + 1], xl[j : j + 1]
                    )
                    outs_h.append(hi)
                    outs_l.append(lo)
                oh_ref[0, pl.ds(i * 8, 8)] = jnp.concatenate(outs_h)
                ol_ref[0, pl.ds(i * 8, 8)] = jnp.concatenate(outs_l)
                return hi, lo

            hi, lo = jax.lax.fori_loop(
                0, nblk, body, (ch_ref[...], cl_ref[...])
            )
            ch_ref[...] = hi
            cl_ref[...] = lo

        return scan_kernel

    import functools

    @functools.partial(jax.jit, static_argnames=("tblk",))
    def exact_scan(p_hi, p_lo, tblk=2048):
        g, n, lanes = p_hi.shape
        grid = (g, n // tblk)
        spec = pl.BlockSpec(
            (1, tblk, lanes), lambda q, t: (q, t, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            make_scan(tblk),
            grid=grid,
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((g, n, lanes), jnp.uint32),
                jax.ShapeDtypeStruct((g, n, lanes), jnp.uint32),
            ],
            scratch_shapes=[
                pltpu.VMEM((1, lanes), jnp.uint32),
                pltpu.VMEM((1, lanes), jnp.uint32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(p_hi, p_lo)

    B = 256
    rows = B // 128
    for n_tips in (65536, 1 << 20):
        p = rng.random((n_tips, B)) * 1e-6
        p[rng.random((n_tips, B)) < 0.3] = 0.0
        ph, plo = split64_np(p.reshape(-1))
        # [G, N, 128]: query lane-group major (block-shape rules want the
        # last two dims to be (tips, 128))
        ph = np.ascontiguousarray(
            ph.reshape(n_tips, rows, 128).transpose(1, 0, 2)
        )
        plo = np.ascontiguousarray(
            plo.reshape(n_tips, rows, 128).transpose(1, 0, 2)
        )
        phd, plod = jnp.asarray(ph), jnp.asarray(plo)
        jax.block_until_ready((phd, plod))
        t0 = time.time()
        oh, ol = exact_scan(phd, plod)
        jax.block_until_ready((oh, ol))
        log(f"2. scan {n_tips} tips x {B} queries: first call "
            f"{time.time() - t0:.1f}s (compile+run)")
        for _ in range(3):
            t0 = time.time()
            oh, ol = exact_scan(phd, plod)
            jax.block_until_ready((oh, ol))
            log(f"   scan run: {(time.time() - t0) * 1e3:.1f} ms")
        if n_tips == 65536:
            oh_t = np.asarray(oh).transpose(1, 0, 2).reshape(n_tips, B)
            ol_t = np.asarray(ol).transpose(1, 0, 2).reshape(n_tips, B)
            got = join64_np(
                oh_t.reshape(-1), ol_t.reshape(-1)
            ).reshape(n_tips, B)
            want = np.cumsum(p, axis=0)  # pairwise? NO: np.cumsum is
            # sequential for 1-D along axis... numpy cumsum is sequential
            # left-to-right in C order per column here; verify bit equality
            mism = got != want
            assert not mism.any(), f"scan mismatch: {mism.sum()} cells"
            log("   65k scan result: bit-exact vs numpy sequential cumsum")
    return 0


if __name__ == "__main__":
    sys.exit(main())

# --- appended: size sweep to split fixed vs marginal cost -------------
if __name__ == "__main__":
    pass
