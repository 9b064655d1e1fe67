"""Streaming-scatter kernel tests (interpret mode on CPU)."""

import numpy as np

from raxtax_tpu.db.database import build_database
from raxtax_tpu.models.oracle import intersection_counts
from raxtax_tpu.ops.intersect_pallas import PAD_ROW
from raxtax_tpu.ops.intersect_stream import (
    build_pairs,
    intersection_counts_stream,
    max_stream_batch,
    prepare_kmer_major_stream,
)
from raxtax_tpu.utils.encoding import encode_sequence, sequence_to_kmers

BASES = "ACGT"


def test_stream_counts_match_oracle():
    rng = np.random.default_rng(11)
    seqs = [
        "".join(BASES[i] for i in rng.integers(0, 4, size=240))
        for _ in range(30)
    ]
    db = build_database(
        [f"p:P{i % 3},s:S{i}" for i in range(30)],
        [encode_sequence(s) for s in seqs],
    )
    queries = [encode_sequence(seqs[i]) for i in (1, 9)]
    queries.append(
        encode_sequence("".join(BASES[i] for i in rng.integers(0, 4, size=230)))
    )
    kmer_sets = [sequence_to_kmers(s) for s in queries]
    k_pad = -(-max(k.size for k in kmer_sets) // 16) * 16
    kidx = np.full((len(queries), k_pad), PAD_ROW, dtype=np.int32)
    for i, km in enumerate(kmer_sets):
        kidx[i, : km.size] = km
    km_dev = prepare_kmer_major_stream(db)
    counts = np.asarray(
        intersection_counts_stream(kidx, km_dev, db.num_tips, interpret=True)
    )
    for i, km in enumerate(kmer_sets):
        np.testing.assert_array_equal(
            counts[i].astype(np.int64),
            intersection_counts(db, km),
            err_msg=f"query {i}",
        )


def test_build_pairs_csr():
    kidx = np.array(
        [[5, 300, PAD_ROW, PAD_ROW], [5, 70000 - 1 & 0xFFFF, 600, PAD_ROW]],
        dtype=np.int32,
    )
    kidx[1, 1] = 5  # duplicate kmer across queries
    q, r, ptr = build_pairs(kidx, 65792)
    assert (np.diff(r) >= 0).all()
    assert ptr[0] == 0 and ptr[-1] == q.shape[0]
    # the three kmer-5 pairs are adjacent and in block 0
    first = r[: ptr[1]]
    assert (first == 5).sum() == 3
    # padded pairs point at the trailing zero row
    assert (r == 65791).sum() >= 3


def test_max_stream_batch_reasonable():
    b = max_stream_batch(9)
    assert b % 8 == 0 and 32 <= b <= 1024
