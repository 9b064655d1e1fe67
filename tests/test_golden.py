"""Committed golden end-to-end fixture (VERDICT r2 item 9).

Real Diptera COI records (from the reference's bundled example,
reference: example/diptera_queries.fasta) with byte-expected
`raxtax.out`/`raxtax.tsv` content checked into tests/data/ — a regression
anchor that survives refactors independently of the oracle code itself.
The 12 queries cover exact-match members (confidence-1.0 override,
src/raxtax.rs:73-84) and non-member near-matches.
"""

from pathlib import Path

import pytest

from raxtax_tpu.db.database import build_database
from raxtax_tpu.io.fasta import (
    parse_query_fasta_file,
    parse_reference_fasta_file,
)

DATA = Path(__file__).parent / "data"


@pytest.fixture(scope="module")
def golden_world():
    recs = parse_reference_fasta_file(DATA / "golden_refs.fasta")
    db = build_database(recs.lineages, recs.sequences)
    queries = parse_query_fasta_file(DATA / "golden_queries.fasta", set())
    out = (DATA / "golden_raxtax.out").read_text()
    tsv = (DATA / "golden_raxtax.tsv").read_text()
    return db, queries, out, tsv


def _classify_all(classifier, queries):
    out_lines, tsv_lines = [], []
    if hasattr(classifier, "classify_batch"):
        bs = classifier.batch_size
        for lo in range(0, len(queries), bs):
            for r in classifier.classify_batch(queries[lo : lo + bs]):
                out_lines.append(r.out_string())
                tsv_lines.append(r.tsv_string())
    else:
        for label, seq in queries:
            r = classifier.classify(label, seq)
            out_lines.append(r.out_string())
            tsv_lines.append(r.tsv_string())
    return "\n".join(out_lines) + "\n", "\n".join(tsv_lines) + "\n"


def test_golden_oracle(golden_world):
    from raxtax_tpu.models.oracle import OracleClassifier

    db, queries, out, tsv = golden_world
    got_out, got_tsv = _classify_all(OracleClassifier(db), queries)
    assert got_out == out
    assert got_tsv == tsv


def test_golden_xla(golden_world):
    from raxtax_tpu.engine.device import DeviceClassifier

    db, queries, out, tsv = golden_world
    clf = DeviceClassifier.create(db, backend="xla", batch_size=4)
    got_out, got_tsv = _classify_all(clf, queries)
    assert got_out == out
    assert got_tsv == tsv


@pytest.mark.heavy
@pytest.mark.parametrize("backend", ["pallas", "stream"])
def test_golden_kernel_backends(golden_world, backend):
    from raxtax_tpu.engine.device import DeviceClassifier

    db, queries, out, tsv = golden_world
    clf = DeviceClassifier.create(db, backend=backend, batch_size=4)
    got_out, got_tsv = _classify_all(clf, queries)
    assert got_out == out
    assert got_tsv == tsv
