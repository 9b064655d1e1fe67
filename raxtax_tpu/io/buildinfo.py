"""Build-info stamping for the log header.

Equivalent of the reference's build.rs + write_build_info
(reference: build.rs:4-29, src/io.rs:92-110): records package version,
runtime (Python/JAX) versions, backend devices and the full command line at
the top of every log file.
"""

from __future__ import annotations

import sys

from .. import __version__


def write_build_info(out) -> None:
    try:
        import jax

        jax_desc = f"jax {jax.__version__}"
    except Exception:  # pragma: no cover - jax is normally present
        jax_desc = "jax unavailable"
    cmdline = " ".join(sys.argv)
    out.write(
        f"raxtax-tpu {__version__} (python {sys.version.split()[0]}, {jax_desc})\n"
        f"Command: {cmdline}\n"
        "------------------------------------------------------------\n"
    )
    out.flush()
