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
