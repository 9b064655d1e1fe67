"""Pallas CSA kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

from raxtax_tpu.db.database import build_database
from raxtax_tpu.models.oracle import intersection_counts
from raxtax_tpu.ops.intersect_pallas import (
    PAD_ROW,
    intersection_counts_pallas,
    prepare_kmer_major,
)
from raxtax_tpu.utils.encoding import encode_sequence, sequence_to_kmers

BASES = "ACGT"


def random_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, size=n))


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(5)
    lineages, seqs = [], []
    for i in range(40):
        lineages.append(f"p:P{i % 2},f:F{i % 8},s:S{i}")
        seqs.append(random_seq(rng, 260))
    db = build_database(lineages, [encode_sequence(s) for s in seqs])
    return db, seqs


def test_pallas_counts_match_oracle(world):
    db, seqs = world
    rng = np.random.default_rng(6)
    queries = [encode_sequence(seqs[i]) for i in (0, 3, 17)]
    queries.append(encode_sequence(random_seq(rng, 250)))
    queries.append(encode_sequence("ACGTACGTNNAC"))  # nearly no kmers
    kmer_sets = [sequence_to_kmers(s) for s in queries]
    k_pad = -(-max(k.size for k in kmer_sets) // 8) * 8
    kmer_idx = np.full((len(queries), k_pad), PAD_ROW, dtype=np.int32)
    for i, km in enumerate(kmer_sets):
        kmer_idx[i, : km.size] = km
    km_dev = prepare_kmer_major(db)
    counts = np.asarray(
        intersection_counts_pallas(kmer_idx, km_dev, db.num_tips)
    )
    for i, km in enumerate(kmer_sets):
        np.testing.assert_array_equal(
            counts[i].astype(np.int64), intersection_counts(db, km), err_msg=f"query {i}"
        )


def test_pallas_counts_saturating_planes(world):
    db, seqs = world
    # all k-mers of one reference -> its own count equals its k-mer set size
    km = sequence_to_kmers(encode_sequence(seqs[7]))
    k_pad = -(-km.size // 8) * 8
    kmer_idx = np.full((1, k_pad), PAD_ROW, dtype=np.int32)
    kmer_idx[0, : km.size] = km
    counts = np.asarray(
        intersection_counts_pallas(kmer_idx, prepare_kmer_major(db), db.num_tips)
    )
    # the matching reference is tip with lineage sorted position of seq 7
    assert counts.max() == km.size


def test_fused_gather_planes_match_legacy(world):
    """The fused-gather variant (scalar-prefetched block index maps, 3-D
    kmer-major layout) must produce bit-identical counter planes to the
    XLA-gather path."""
    from raxtax_tpu.ops.intersect_pallas import intersection_planes_pallas

    db, seqs = world
    queries = [encode_sequence(seqs[i]) for i in (1, 9, 23)]
    kmer_sets = [sequence_to_kmers(s) for s in queries]
    k_pad = -(-max(k.size for k in kmer_sets) // 16) * 16
    kmer_idx = np.full((len(queries), k_pad), PAD_ROW, dtype=np.int32)
    for i, km in enumerate(kmer_sets):
        kmer_idx[i, : km.size] = km
    legacy = np.asarray(
        intersection_planes_pallas(
            kmer_idx, prepare_kmer_major(db, fused_gather=False)
        )
    )
    fused = np.asarray(
        intersection_planes_pallas(
            kmer_idx, prepare_kmer_major(db, fused_gather=True)
        )
    )
    np.testing.assert_array_equal(fused, legacy)
