"""Multi-host support helpers: query slicing, shard naming, shard merging.

Real multi-process runs need a pod; the helpers are pure functions plus file
plumbing, fully testable single-process (the n_processes == 1 case is the
production single-host path).
"""

from pathlib import Path

from raxtax_tpu.parallel.multihost import (
    consolidate_artifacts,
    host_query_slice,
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


def test_consolidate_merges_committed_shards(tmp_path: Path):
    for k, (out, ckp) in enumerate(
        [("a\tx\nb\ty\n", "a\nb\n"), ("c\tz\n", "c\n"), ("", "")]
    ):
        (tmp_path / f"raxtax.out.shard{k}").write_text(out)
        (tmp_path / f"raxtax.ckp.shard{k}").write_text(ckp)
    consolidate_artifacts(tmp_path)
    assert (tmp_path / "raxtax.out").read_text() == "a\tx\nb\ty\nc\tz\n"
    assert sorted(
        (tmp_path / "raxtax.ckp").read_text().split()
    ) == ["a", "b", "c"]
    assert not list(tmp_path.glob("*.shard*"))
    # idempotent and append-safe: a second run with no shards is a no-op
    consolidate_artifacts(tmp_path)
    assert (tmp_path / "raxtax.out").read_text() == "a\tx\nb\ty\nc\tz\n"


def test_consolidate_trims_uncommitted_lines(tmp_path: Path):
    # shard has result lines for "b" but "b" never hit the progress file:
    # its lines are dropped (the progress-file commit contract)
    (tmp_path / "raxtax.out.shard0").write_text("a\tx\nb\tgarbage\n")
    (tmp_path / "raxtax.ckp.shard0").write_text("a\n")
    consolidate_artifacts(tmp_path)
    assert (tmp_path / "raxtax.out").read_text() == "a\tx\n"


def test_consolidate_is_crash_safe_against_reapplied_shards(tmp_path: Path):
    """A crash between 'append shard to merged' and 'unlink shard' leaves
    the shard on disk; the next consolidation re-applies it and must NOT
    duplicate its lines (label-level dedup, round-2 review finding)."""
    (tmp_path / "raxtax.out.shard0").write_text("a\tx\na\tx2\nb\ty\n")
    (tmp_path / "raxtax.ckp.shard0").write_text("a\nb\n")
    consolidate_artifacts(tmp_path)
    merged = (tmp_path / "raxtax.out").read_text()
    assert merged == "a\tx\na\tx2\nb\ty\n"
    # simulate the crash: the shard files reappear with the same content
    (tmp_path / "raxtax.out.shard0").write_text("a\tx\na\tx2\nb\ty\n")
    (tmp_path / "raxtax.ckp.shard0").write_text("a\nb\n")
    consolidate_artifacts(tmp_path)
    assert (tmp_path / "raxtax.out").read_text() == merged
    assert sorted((tmp_path / "raxtax.ckp").read_text().split()) == ["a", "b"]


def test_consolidate_preserves_existing_merged_output(tmp_path: Path):
    (tmp_path / "raxtax.out").write_text("old\tline\n")
    (tmp_path / "raxtax.out.shard0").write_text("")
    (tmp_path / "raxtax.ckp.shard0").write_text("")
    consolidate_artifacts(tmp_path)
    # empty shards never clobber completed merged output
    assert (tmp_path / "raxtax.out").read_text() == "old\tline\n"
