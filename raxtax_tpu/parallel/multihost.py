"""Multi-host (multi-process) execution support.

The reference is single-process (SURVEY.md §5: no distributed backend); the
TPU-native framework scales across hosts with `jax.distributed`: every host
runs the same program, the global ('data','model') mesh spans all chips, and
each host feeds its own slice of the query stream (data-parallel at the host
level). Outputs are written as per-host shards with a deterministic order
and merged by `merge_output_shards` (host 0 or any later invocation), which
preserves the reference's single-file, query-ordered artifact contract.

Single-host runs are the n_processes == 1 degenerate case throughout, so all
of this logic is exercised by the regular test suite.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

log = logging.getLogger("raxtax")


def maybe_initialize(coordinator: str = "", num_processes: int = 0,
                     process_id: int = -1) -> tuple[int, int]:
    """Initialize jax.distributed when configured; returns
    (process_index, process_count).

    Configuration sources, in priority order: explicit arguments, the
    standard JAX env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID), TPU pod auto-detection (jax.distributed.initialize with
    no args inside a pod slice). Single process when none apply.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS", "")
    if num_processes <= 0:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if process_id < 0:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "-1") or -1)
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes or None,
            process_id=process_id if process_id >= 0 else None,
        )
        log.info(
            "jax.distributed initialized: process %d/%d via %s",
            jax.process_index(), jax.process_count(), coordinator,
        )
    return jax.process_index(), jax.process_count()


def host_query_slice(
    n_queries: int, process_index: int, process_count: int
) -> tuple[int, int]:
    """Contiguous [start, end) slice of the query list owned by this host.

    Contiguous (not strided) so each host's output shard is itself in global
    query order and shards concatenate into the reference's ordering.
    """
    per = -(-n_queries // process_count)
    start = min(process_index * per, n_queries)
    return start, min(start + per, n_queries)


def shard_suffix(process_index: int, process_count: int) -> str:
    """'' for single-process runs (reference-identical filenames)."""
    if process_count <= 1:
        return ""
    width = len(str(process_count - 1))
    return f".shard{process_index:0{width}d}"


def merge_output_shards(prefix: Path, name: str, process_count: int) -> Path:
    """Concatenate `<prefix>/<name>.shardK` files (K ascending) into
    `<prefix>/<name>` and remove the shards. Idempotent."""
    out = prefix / name
    shards = [
        prefix / f"{name}{shard_suffix(k, process_count)}"
        for k in range(process_count)
    ]
    missing = [s for s in shards if not s.is_file()]
    if missing:
        raise FileNotFoundError(f"missing output shards: {missing}")
    with open(out, "w") as dst:
        for s in shards:
            with open(s) as src:
                dst.write(src.read())
    for s in shards:
        if s != out:
            s.unlink()
    return out
