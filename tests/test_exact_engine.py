"""EXACT-mode engine byte parity vs the f64 host oracle.

Forces RAXTAX_EXACT=1 so every batch runs the on-device exact-f64
significance/descent pipeline (ops/exactscan.py) and compares the full
formatted output (raxtax.out + raxtax.tsv lines) against the oracle for
randomized tie-dense worlds and every flag combination — the same contract
as tests/test_fuzz_parity.py for the legacy paths.
"""

from __future__ import annotations

import os

import pytest

from raxtax_tpu.engine.device import DeviceClassifier
from raxtax_tpu.models.oracle import OracleClassifier
from tests.test_fuzz_parity import make_world


@pytest.mark.heavy
@pytest.mark.parametrize(
    "seed,skip_exact,raw_conf,split2",
    [
        (9100, False, False, "1"),
        (9101, True, False, "1"),
        (9102, False, True, "0"),
        (9103, True, True, "1"),
        (9104, False, False, "0"),
    ],
)
def test_exact_mode_byte_parity(seed, skip_exact, raw_conf, split2,
                                monkeypatch):
    monkeypatch.setenv("RAXTAX_EXACT", "1")
    monkeypatch.setenv("RAXTAX_SPLIT2", split2)
    db, queries = make_world(seed)
    dev = DeviceClassifier.create(
        db,
        backend="pallas",
        batch_size=4,
        skip_exact_matches=skip_exact,
        raw_confidence=raw_conf,
    )
    orc = OracleClassifier(
        db, skip_exact_matches=skip_exact, raw_confidence=raw_conf
    )
    got = []
    for lo in range(0, len(queries), 4):
        got += dev.classify_batch(queries[lo : lo + 4])
    assert dev._exact_mode or os.environ.get("RAXTAX_EXACT") == "1"
    for (label, seq), qr in zip(queries, got):
        want = orc.classify(label, seq)
        assert qr.out_string() == want.out_string(), label
        assert qr.tsv_string() == want.tsv_string(), label


@pytest.mark.heavy
def test_exact_mode_pipelined_parity(monkeypatch):
    """3-phase pipelined driving (the bench loop shape) under EXACT mode."""
    from collections import deque

    monkeypatch.setenv("RAXTAX_EXACT", "1")
    db, queries = make_world(9200)
    dev = DeviceClassifier.create(db, backend="pallas", batch_size=4)
    orc = OracleClassifier(db)
    got = []
    prepared: deque = deque()
    for lo in range(0, len(queries), 4):
        a = dev.submit_batch(queries[lo : lo + 4])
        if len(prepared) >= 2:
            got += dev.finalize_batch(prepared.popleft())
        prepared.append(dev.prepare_batch(a))
    while prepared:
        got += dev.finalize_batch(prepared.popleft())
    for (label, seq), qr in zip(queries, got):
        want = orc.classify(label, seq)
        assert qr.out_string() == want.out_string(), label
        assert qr.tsv_string() == want.tsv_string(), label
