"""JAX runtime configuration for the classifier.

Centralizes process-wide JAX knobs so the CLI, the benchmark and the driver
entry points agree. The persistent compilation cache matters in particular:
the device pipeline jits several large programs (bit-matmul scan, Pallas
fold, top-k compaction) whose first compile costs tens of seconds per shape
bucket — cached, repeat runs start in seconds.
"""

from __future__ import annotations

import os

_DONE = False

DEFAULT_CACHE_DIR = os.environ.get(
    "RAXTAX_JAX_CACHE", os.path.expanduser("~/.cache/raxtax-jax")
)


def setup_jax(cache_dir: str | None = None) -> None:
    """Idempotent process-wide JAX setup (compilation cache)."""
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    d = cache_dir or DEFAULT_CACHE_DIR
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # cache is best-effort; never fail a run over it
        pass
