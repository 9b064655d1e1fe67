"""End-to-end CLI tests: output artifacts, checkpoint/resume, flags.

Mirrors the reference's CLI behavior (src/main.rs, src/io.rs) including the
three-artifact checkpoint scheme and resume-with-trim semantics.
"""

import numpy as np
import pytest

from raxtax_tpu.cli import main

REF = """>r1;tax=p:A,f:F1,s:S1;
AAACCCTTTGGGAAACCCTTTGGGA
>r2;tax=p:A,f:F1,s:S2;
AAACCCTTTGGGAAACCCTTTGGCT
>r3;tax=p:A,f:F2,s:S3;
TTTGGGAAACCCTTTGGGACCCAAA
>r4;tax=p:B,f:F3,s:S4;
GGGTTTAAACCCGGGTTTAAACCCG
"""

QUERIES = """>q1
AAACCCTTTGGGAAACCCTTTGGGA
>q2
AAACCCTTTGGGAAACCCTTTGGCA
>q3
CGCGCGCGATATATGCGCGCATATA
"""


@pytest.fixture
def world(tmp_path):
    ref = tmp_path / "refs.fasta"
    ref.write_text(REF)
    q = tmp_path / "queries.fasta"
    q.write_text(QUERIES)
    out = tmp_path / "out"
    return ref, q, out


def run_cli(ref, q, out, *extra):
    return main(
        ["-d", str(ref), "-i", str(q), "-o", str(out), "--backend", "oracle"]
        + list(extra)
    )


def test_basic_run(world):
    ref, q, out = world
    assert run_cli(ref, q, out) == 0
    out_lines = (out / "raxtax.out").read_text().strip().split("\n")
    # q1 is an exact match of r1 -> confidence 1.00 on every level
    q1 = [l for l in out_lines if l.startswith("q1\t")]
    assert len(q1) == 1
    assert q1[0].split("\t")[1] == "p:A,f:F1,s:S1"
    assert q1[0].split("\t")[2] == "1.00,1.00,1.00"
    # every query produced at least one line
    for label in ("q1", "q2", "q3"):
        assert any(l.startswith(label + "\t") for l in out_lines)
    # artifacts exist
    assert (out / "raxtax.log").is_file()
    assert (out / "raxtax.ckp").is_file()
    assert (out / "raxtax.json").is_file()
    # binary DB was created and is loadable
    dbs = list(out.glob("*.bin.npz"))
    assert len(dbs) == 1
    # progress file lists all queries in completion order
    ckp = (out / "raxtax.ckp").read_text().strip().split("\n")
    assert set(ckp) == {"q1", "q2", "q3"}
    # log contains build info and phase timers
    log_text = (out / "raxtax.log").read_text()
    assert "raxtax-tpu" in log_text
    assert "Total Runtime" in log_text


def test_tsv_output(world):
    ref, q, out = world
    assert run_cli(ref, q, out, "--tsv") == 0
    tsv_lines = (out / "raxtax.tsv").read_text().strip().split("\n")
    q1 = [l for l in tsv_lines if l.startswith("q1\t")][0].split("\t")
    # taxa interleaved with confidences, then signals, then the sequence
    assert q1[1] == "p:A"
    assert q1[2] == "1.00"
    assert q1[3] == "f:F1"
    assert q1[-1] == "AAACCCTTTGGGAAACCCTTTGGGA"


def test_existing_output_requires_redo(world):
    ref, q, out = world
    assert run_cli(ref, q, out) == 0
    # remove checkpoint json but keep the dir: must refuse without --redo
    (out / "raxtax.json").unlink()
    assert run_cli(ref, q, out) != 0
    assert run_cli(ref, q, out, "--redo") == 0


def test_resume_skips_processed(world, monkeypatch):
    ref, q, out = world
    assert run_cli(ref, q, out) == 0
    first_out = (out / "raxtax.out").read_text()
    # simulate an interrupted run: q3 was not committed
    ckp = (out / "raxtax.ckp").read_text().strip().split("\n")
    (out / "raxtax.ckp").write_text("\n".join(l for l in ckp if l != "q3") + "\n")

    classified = []
    from raxtax_tpu.models.oracle import OracleClassifier

    orig = OracleClassifier.classify

    def spy(self, label, seq):
        classified.append(label)
        return orig(self, label, seq)

    monkeypatch.setattr(OracleClassifier, "classify", spy)
    assert run_cli(ref, q, out) == 0
    # only q3 was re-classified
    assert classified == ["q3"]
    # q3's stale lines were trimmed and rewritten; final content matches
    assert sorted((out / "raxtax.out").read_text().strip().split("\n")) == sorted(
        first_out.strip().split("\n")
    )


def test_flag_change_invalidates_checkpoint(world, monkeypatch):
    ref, q, out = world
    assert run_cli(ref, q, out) == 0
    ckp = (out / "raxtax.ckp").read_text()
    assert ckp.strip()
    classified = []
    from raxtax_tpu.models.oracle import OracleClassifier

    orig = OracleClassifier.classify

    def spy(self, label, seq):
        classified.append(label)
        return orig(self, label, seq)

    monkeypatch.setattr(OracleClassifier, "classify", spy)
    # different semantics flag -> checkpoint invalid; without --redo the
    # existing binary DB blocks the rerun (reference: src/io.rs:278-280)
    assert run_cli(ref, q, out, "--raw-confidence") == 73  # CANTCREAT
    assert run_cli(ref, q, out, "--raw-confidence", "--redo") == 0
    assert set(classified) == {"q1", "q2", "q3"}


def test_only_db_and_reuse(world):
    ref, q, out = world
    assert main(["-d", str(ref), "-o", str(out), "--only-db", "--backend", "oracle"]) == 0
    dbs = list(out.glob("*.bin.npz"))
    assert len(dbs) == 1
    assert not (out / "raxtax.out").exists() or not (out / "raxtax.out").read_text()
    # second run resumes from the binary DB (checkpoint points at it)
    assert run_cli(ref, q, out) == 0
    assert (out / "raxtax.out").read_text().strip()


def test_clean_removes_artifacts(world):
    ref, q, out = world
    assert run_cli(ref, q, out, "--clean") == 0
    assert not (out / "raxtax.json").exists()
    assert not (out / "raxtax.ckp").exists()
    assert not list(out.glob("*.bin.npz"))
    assert (out / "raxtax.out").is_file()


def test_skip_db(world):
    ref, q, out = world
    assert run_cli(ref, q, out, "--skip-db") == 0
    assert not list(out.glob("*.bin.npz"))


def test_missing_query_file(world):
    ref, q, out = world
    assert main(["-d", str(ref), "-o", str(out), "--backend", "oracle"]) != 0


def test_missing_input(world):
    ref, q, out = world
    assert main(["-d", str(ref / "nope"), "-i", str(q), "-o", str(out)]) != 0
