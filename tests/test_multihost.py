"""Multi-host support helpers: query slicing, shard naming, shard merging.

Real multi-process runs need a pod; the helpers are pure functions plus file
plumbing, fully testable single-process (the n_processes == 1 case is the
production single-host path).
"""

from pathlib import Path

import pytest

from raxtax_tpu.parallel.multihost import (
    host_query_slice,
    merge_output_shards,
    shard_suffix,
)


def test_host_query_slice_partitions_exactly():
    for n in [0, 1, 7, 100, 1001]:
        for pc in [1, 2, 3, 8]:
            slices = [host_query_slice(n, i, pc) for i in range(pc)]
            covered = []
            for lo, hi in slices:
                covered.extend(range(lo, hi))
            assert covered == list(range(n)), (n, pc)
            # contiguous ascending: shard k's range precedes shard k+1's
            for (a, b), (c, d) in zip(slices, slices[1:]):
                assert b == c


def test_shard_suffix():
    assert shard_suffix(0, 1) == ""
    assert shard_suffix(3, 8) == ".shard3"
    assert shard_suffix(3, 16) == ".shard03"


def test_merge_output_shards(tmp_path: Path):
    for k, content in enumerate(["a\nb\n", "c\n", ""]):
        (tmp_path / f"raxtax.out.shard{k}").write_text(content)
    out = merge_output_shards(tmp_path, "raxtax.out", 3)
    assert out.read_text() == "a\nb\nc\n"
    assert not list(tmp_path.glob("raxtax.out.shard*"))


def test_merge_missing_shard_raises(tmp_path: Path):
    (tmp_path / "raxtax.out.shard0").write_text("a\n")
    with pytest.raises(FileNotFoundError):
        merge_output_shards(tmp_path, "raxtax.out", 2)
