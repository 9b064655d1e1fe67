"""Native host kernels (ctypes C++) vs pure-numpy reference implementations.

Skips cleanly when g++ is unavailable (the numpy fallbacks are then the
production path and are covered by the other test modules).
"""

import numpy as np
import pytest

from raxtax_tpu import native
from raxtax_tpu.db import bitmatrix
from raxtax_tpu.utils.encoding import (
    encode_sequence,
    sequence_to_kmer_windows,
)

BASES = "ACGT"


def _numpy_distinct(codes):
    return np.unique(sequence_to_kmer_windows(codes))


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


@pytest.fixture(scope="module")
def seqs():
    rng = np.random.default_rng(5)
    out = []
    for i in range(64):
        s = "".join(BASES[b] for b in rng.integers(0, 4, size=30 + 7 * i))
        out.append(encode_sequence(s))
    # ambiguity codes break windows
    out.append(encode_sequence("ACGTNNNNACGTACGTWWSSACGTACGTTTTT"))
    out.append(encode_sequence("NNNNNNNN"))
    out.append(encode_sequence("ACGT"))  # shorter than k
    return out


def test_distinct_kmers_matches_numpy(lib, seqs):
    for s in seqs:
        got = native.distinct_kmers(s)
        np.testing.assert_array_equal(got, _numpy_distinct(s))


def test_bit_matrices_match_numpy(lib, seqs):
    ref_major, kmer_major = native.build_bit_matrices(seqs)
    ref_ids, kmers = bitmatrix.distinct_kmers_per_ref(seqs)
    np.testing.assert_array_equal(
        ref_major, bitmatrix.build_ref_major(ref_ids, kmers, len(seqs))
    )
    np.testing.assert_array_equal(
        kmer_major, bitmatrix.build_kmer_major(ref_ids, kmers, len(seqs))
    )


def test_pack_query_rows_matches_numpy(lib, seqs):
    rows = native.pack_query_rows(seqs)
    kmer_sets = [_numpy_distinct(s) for s in seqs]
    np.testing.assert_array_equal(rows, bitmatrix.pack_query_kmers(kmer_sets))


def test_tip_cumsum_matches_numpy(lib, seqs):
    import jax.numpy as jnp

    from raxtax_tpu.ops.compress import compress_counts

    rng = np.random.default_rng(17)
    N = 1000
    counts = rng.poisson(2.0, size=(4, N)).astype(np.float32)
    counts[2, rng.integers(0, N, 20)] = 120
    table = rng.random(200)
    plane, oi, ov, no = (np.asarray(x) for x in compress_counts(jnp.asarray(counts), budget=64))
    for b in range(4):
        cum = native.tip_cumsum_nibble(plane[b], oi[b], ov[b], int(no[b]), table, N)
        want = np.concatenate(([0.0], np.cumsum(table[counts[b].astype(np.int64)])))
        np.testing.assert_array_equal(cum, want)
        cum16 = native.tip_cumsum_u16(counts[b].astype(np.uint16), table, N)
        np.testing.assert_array_equal(cum16, want)
