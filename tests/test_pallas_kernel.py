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
    # the per-query step gate must not change the planes: padded steps
    # fold all-zero PAD_ROW rows, so skipping them is arithmetically inert
    gated = np.asarray(
        intersection_planes_pallas(
            kmer_idx,
            prepare_kmer_major(db, fused_gather=True),
            kcounts=np.array([k.size for k in kmer_sets], np.int64),
        )
    )
    np.testing.assert_array_equal(gated, legacy)


def test_sparse_fold_planes_match_dense(world):
    """The block-sparse ripple fold must produce bit-identical counter
    planes to the dense fold on every block its pairs touch — and zeros on
    the blocks they skip. block_sub=1 shrinks blocks to 4096 references so
    the 40-reference world still spans the multi-block index math in
    interpret mode (on hardware blocks are >= 8 sublanes)."""
    from raxtax_tpu.ops.intersect_pallas import (
        build_pairs,
        intersection_planes_pallas,
        intersection_planes_sparse,
        prepare_kmer_major_sparse,
    )

    db, seqs = world
    rng = np.random.default_rng(11)
    queries = [encode_sequence(seqs[i]) for i in (2, 5, 31)]
    queries.append(encode_sequence(random_seq(rng, 240)))
    kmer_sets = [sequence_to_kmers(s) for s in queries]
    k_pad = -(-max(k.size for k in kmer_sets) // 16) * 16
    kmer_idx = np.full((len(queries), k_pad), PAD_ROW, dtype=np.int32)
    for i, km in enumerate(kmer_sets):
        kmer_idx[i, : km.size] = km
    dense = np.asarray(
        intersection_planes_pallas(
            kmer_idx, prepare_kmer_major(db, fused_gather=False)
        )
    )
    km3, blk_ptr, blk_ids = prepare_kmer_major_sparse(db)
    pair_kmer, pair_blk, max_pairs, totals = build_pairs(
        kmer_idx, blk_ptr, blk_ids, budget=1 << 20
    )
    assert max_pairs >= 1
    sparse = np.asarray(
        intersection_planes_sparse(
            pair_kmer, pair_blk, km3, max_count=k_pad, totals=totals
        )
    )
    # compare on the dense extent; the sparse matrix may be padded wider
    S = dense.shape[2]
    np.testing.assert_array_equal(sparse[:, :, :S, :], dense)
    assert not sparse[:, :, S:, :].any()


def test_sparse_fold_multiblock_synthetic():
    """Multi-block index math: a synthetic k-mer-major matrix whose rows
    post in scattered blocks, folded at block_sub=1 (4096 refs/block) so a
    small world spans several blocks. Expected counts are recomputed in
    numpy from the raw bit matrix."""
    import jax.numpy as jnp

    from raxtax_tpu.ops.intersect_pallas import (
        PAD_ROW,
        build_pairs,
        intersection_planes_sparse,
    )
    from raxtax_tpu.ops.planes import WORD_BITS

    rng = np.random.default_rng(3)
    n_words = 512  # 4 blocks of 128 words at block_sub=1 (16384 tips)
    n_kmers = PAD_ROW + 1
    km = np.zeros((n_kmers, n_words), np.uint32)
    used = rng.choice(PAD_ROW, size=60, replace=False).astype(np.int32)
    for k in used:
        # each k-mer posts densely inside 1-3 random blocks (the
        # lineage-clustered profile the sparse fold exploits)
        for blk in rng.choice(4, size=rng.integers(1, 4), replace=False):
            w = rng.integers(0, 1 << 32, size=40, dtype=np.uint64)
            pos = rng.choice(128, size=40, replace=False)
            km[k, blk * 128 + pos] |= w.astype(np.uint32)
    km3 = jnp.asarray(km.reshape(n_kmers, -1, 128))
    nz = km.reshape(n_kmers, 4, 128).any(axis=2)
    blk_ptr = np.zeros(n_kmers + 1, np.int64)
    np.cumsum(nz.sum(axis=1, dtype=np.int64), out=blk_ptr[1:])
    blk_ids = np.nonzero(nz)[1].astype(np.int32)

    B, k_pad = 3, 32
    kmer_idx = np.full((B, k_pad), PAD_ROW, np.int32)
    for b in range(B):
        sel = rng.choice(used, size=rng.integers(5, k_pad), replace=False)
        kmer_idx[b, : sel.size] = np.sort(sel)
    pair_kmer, pair_blk, _, totals = build_pairs(
        kmer_idx, blk_ptr, blk_ids, budget=1 << 20
    )
    planes = np.asarray(
        intersection_planes_sparse(
            pair_kmer, pair_blk, km3, max_count=k_pad, block_sub=1,
            totals=totals,
        )
    )
    # decode the planes back to per-tip counts
    n_planes = planes.shape[1]
    flat = planes.reshape(B, n_planes, -1)
    counts = np.zeros((B, n_words * WORD_BITS), np.int64)
    for p in range(n_planes):
        bits = (flat[:, p, :, None] >> np.arange(WORD_BITS)) & 1
        counts += bits.reshape(B, -1).astype(np.int64) << p
    # expected: popcount-sum of the selected rows
    for b in range(B):
        rows = km[kmer_idx[b][kmer_idx[b] != PAD_ROW]]
        exp = np.zeros(n_words * WORD_BITS, np.int64)
        for r in rows:
            exp += (r[:, None] >> np.arange(WORD_BITS) & 1).reshape(-1)
        np.testing.assert_array_equal(counts[b], exp, err_msg=f"query {b}")


def test_build_pairs_budget_overflow(world):
    from raxtax_tpu.ops.intersect_pallas import (
        build_pairs,
        prepare_kmer_major_sparse,
    )

    db, seqs = world
    km = sequence_to_kmers(encode_sequence(seqs[0]))
    kmer_idx = np.full((1, 16), PAD_ROW, dtype=np.int32)
    kmer_idx[0, : min(16, km.size)] = km[:16]
    _, blk_ptr, blk_ids = prepare_kmer_major_sparse(db, block_sub=1)
    assert build_pairs(kmer_idx, blk_ptr, blk_ids, budget=1) is None
