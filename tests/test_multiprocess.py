"""Real two-process jax.distributed run (CPU backend, localhost
coordinator): per-host query slices, per-host output shards, deterministic
merge — byte-identical to a single-process run."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

FASTA = """\
>a1;tax=p:A,g:G1,s:S1;
ACGTACGTACGTACGTACGTACGTACGTACGTGGTTAACC
>a2;tax=p:A,g:G1,s:S2;
ACGTACGTACGTACGTACGTACGTACGTACGTGGTTAACG
>a3;tax=p:A,g:G2,s:S3;
TTTTACGTACGTACGTACGGACGTACGTACGTGGTTAACC
>b1;tax=p:B,g:G3,s:S4;
GGGGACGTACGTCCCCACGTACGTACGTTTTTGGTTAACC
>b2;tax=p:B,g:G3,s:S5;
GGGGACGTACGTCCCCACGTACGAACGTTTTTGGTTAACC
>b3;tax=p:B,g:G4,s:S6;
CCCCTTTTGGGGACGTACGTACGTACGTAAAAGGTTAACC
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_proc(
    pid: int, port: int, tmp: Path, out: Path, nproc: int,
    global_mesh: bool = False,
):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # per-host meshes use 2 virtual devices each; the global mesh spans one
    # device per process (the cross-host model-sharding configuration)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%d" % (
        1 if global_mesh else 2
    )
    env["PYTHONPATH"] = str(REPO)
    extra = "'--global-mesh', " if global_mesh else ""
    code = (
        "import sys; from raxtax_tpu.cli import main; sys.exit(main(["
        f"'-d', r'{tmp / 'refs.fasta'}', '-i', r'{tmp / 'refs.fasta'}', "
        f"'-o', r'{out}', '--redo', '--backend', 'xla', "
        f"'--coordinator', '127.0.0.1:{port}', "
        f"'--num-processes', '{nproc}', '--process-id', '{pid}', "
        f"{extra}"
        "'--mesh', '1,2', '--batch-size', '4']))"
    )
    return subprocess.Popen(
        [sys.executable, "-c", code], env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


@pytest.mark.slow
def test_two_process_distributed_matches_single(tmp_path: Path):
    (tmp_path / "refs.fasta").write_text(FASTA)
    out_multi = tmp_path / "multi"
    port = _free_port()
    procs = [
        _run_proc(pid, port, tmp_path, out_multi, 2) for pid in range(2)
    ]
    codes = [p.wait(timeout=300) for p in procs]
    assert codes == [0, 0]

    # single-process reference
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    out_single = tmp_path / "single"
    code = (
        "import sys; from raxtax_tpu.cli import main; sys.exit(main(["
        f"'-d', r'{tmp_path / 'refs.fasta'}', '-i', r'{tmp_path / 'refs.fasta'}', "
        f"'-o', r'{out_single}', '--redo', '--backend', 'xla', "
        "'--batch-size', '4']))"
    )
    assert subprocess.run(
        [sys.executable, "-c", code], env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    ).returncode == 0

    multi = (out_multi / "raxtax.out").read_text()
    single = (out_single / "raxtax.out").read_text()
    assert multi == single
    # shards were merged away
    assert not list(out_multi.glob("raxtax.out.shard*"))


@pytest.mark.slow
def test_global_mesh_model_sharding_matches_single(tmp_path: Path):
    """SURVEY §7 M5: ONE ('data','model') mesh spanning two processes (one
    device each), the database model-sharded ACROSS hosts, identical global
    batches from both — output byte-identical to a single-process run."""
    (tmp_path / "refs.fasta").write_text(FASTA)
    out_multi = tmp_path / "multi"
    port = _free_port()
    procs = [
        _run_proc(pid, port, tmp_path, out_multi, 2, global_mesh=True)
        for pid in range(2)
    ]
    codes = [p.wait(timeout=300) for p in procs]
    assert codes == [0, 0]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(REPO)
    out_single = tmp_path / "single"
    code = (
        "import sys; from raxtax_tpu.cli import main; sys.exit(main(["
        f"'-d', r'{tmp_path / 'refs.fasta'}', '-i', r'{tmp_path / 'refs.fasta'}', "
        f"'-o', r'{out_single}', '--redo', '--backend', 'xla', "
        "'--mesh', '1,2', '--batch-size', '4']))"
    )
    assert subprocess.run(
        [sys.executable, "-c", code], env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    ).returncode == 0

    multi = (out_multi / "raxtax.out").read_text()
    single = (out_single / "raxtax.out").read_text()
    assert multi == single
    # one logical output: no shard artifacts anywhere
    assert not list(out_multi.glob("*.shard*"))
