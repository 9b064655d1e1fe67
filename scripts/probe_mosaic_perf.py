#!/usr/bin/env python
"""Microbenchmarks of Mosaic vector-op costs on the real chip.

Isolates why the exact-f64 sequential scan runs ~100x slower than its
instruction-count estimate: times K iterations of a register-resident op
chain (no memory traffic in the loop), for plain u32 add, u32 add chain,
variable-amount shift, fixed-amount shift, and the full f64_add.
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

from raxtax_tpu.ops.exactf64 import f64_add, split64_np  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


ITERS = 5_000_000


def run(name, body_fn, n_state=2):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]

        def body(i, st):
            return body_fn(st, a, b, i)

        st = tuple(a + jnp.uint32(j) for j in range(n_state))
        st = jax.lax.fori_loop(0, ITERS, body, st)
        acc = st[0]
        for s in st[1:]:
            acc = acc ^ s
        o_ref[...] = acc

    x = np.arange(8 * 128, dtype=np.uint32).reshape(8, 128)
    y = (x % 23).astype(np.uint32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
    )
    f(x, y).block_until_ready()  # compile
    t0 = time.time()
    f(x, y).block_until_ready()
    dt = time.time() - t0
    log(f"{name:28s} {dt * 1e9 / ITERS:8.1f} ns/iter")


def main() -> int:
    log(f"devices: {jax.devices()}")

    run("u32_add_x1", lambda st, a, b, i: (st[0] + b, st[1]))
    run(
        "u32_add_x8",
        lambda st, a, b, i: (
            st[0] + b + a + b + a + b + a + b + a,
            st[1],
        ),
    )
    run("shift_fixed_x1", lambda st, a, b, i: (st[0] >> 5, st[1] + a))
    run("shift_var_x1", lambda st, a, b, i: (st[0] >> (b & 31), st[1] + a))
    run(
        "shift_var_x4",
        lambda st, a, b, i: (
            (((st[0] >> (b & 31)) << (b & 15)) >> (b & 7)) << (b & 3),
            st[1] + a,
        ),
    )
    run(
        "cmp_select_x1",
        lambda st, a, b, i: (
            jnp.where(st[0] > b, st[0] + a, st[1]),
            st[1] + a,
        ),
    )
    run(
        "f64_add_full",
        lambda st, a, b, i: f64_add(st[0], st[1], a, b),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
