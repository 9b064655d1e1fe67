"""Golden tests for DNA encoding and k-mer extraction.

Expected values transcribed from the reference unit tests
(src/utils.rs:236-263, src/parser.rs:219-233).
"""

import numpy as np
import pytest

from raxtax_tpu.utils.encoding import (
    FOUR_TO_TWO_BIT,
    InvalidCharacterError,
    decompress_sequence,
    encode_sequence,
    round_half_away,
    sequence_to_kmers,
)


def test_iupac_encoding():
    # src/parser.rs:226-233
    seq = encode_sequence("ACGTWSMKRYBDHVN")
    assert seq.tolist() == [1, 2, 4, 8, 9, 6, 3, 12, 5, 10, 14, 13, 11, 7, 15]
    assert encode_sequence("AAACCCTTTGGGA").tolist() == [
        1, 1, 1, 2, 2, 2, 8, 8, 8, 4, 4, 4, 1,
    ]
    assert encode_sequence("acgt").tolist() == [1, 2, 4, 8]


def test_invalid_char():
    with pytest.raises(InvalidCharacterError):
        encode_sequence("ACGX")


def test_two_bit_map():
    # src/utils.rs:237-243
    assert FOUR_TO_TWO_BIT[1] == 0
    assert FOUR_TO_TWO_BIT[2] == 1
    assert FOUR_TO_TWO_BIT[4] == 2
    assert FOUR_TO_TWO_BIT[8] == 3
    assert FOUR_TO_TWO_BIT[10] == 255


def test_sequence_to_kmers_golden():
    # src/utils.rs:246-263
    sequence = np.array(
        [1, 2, 1, 4, 8, 2, 8, 4, 1, 4, 8, 2, 8, 4, 1, 4], dtype=np.uint8
    )
    kmers = sequence_to_kmers(sequence)
    assert (np.diff(kmers.astype(np.int32)) > 0).all()
    assert kmers.tolist() == [
        0b0001_0010_1101_1110,
        0b0010_1101_1110_0010,
        0b0100_1011_0111_1000,
        0b0111_1000_1011_0111,
        0b1000_1011_0111_1000,
        0b1011_0111_1000_1011,
        0b1101_1110_0010_1101,
        0b1110_0010_1101_1110,
    ]


def test_kmers_skip_ambiguity():
    # windows containing IUPAC ambiguity codes are dropped
    seq = encode_sequence("AAAAAAAANAAAAAAAA")
    kmers = sequence_to_kmers(seq)
    assert kmers.tolist() == [0]
    seq = encode_sequence("NNNNNNNN")
    assert sequence_to_kmers(seq).size == 0
    seq = encode_sequence("ACGT")  # shorter than k
    assert sequence_to_kmers(seq).size == 0


def test_decompress():
    # src/utils.rs:266-273
    seq = np.array(
        [1, 2, 1, 4, 8, 2, 8, 4, 1, 4, 8, 2, 8, 4, 1, 4], dtype=np.uint8
    )
    assert decompress_sequence(seq) == "ACAGTCTGAGTCTGAG"
    assert decompress_sequence(np.array([15, 9, 1], dtype=np.uint8)) == "--A"


def test_round_half_away():
    # Rust f64::round semantics at 2 decimals (src/lineage.rs:128-129)
    assert round_half_away(0.005) == 0.01
    assert round_half_away(0.004999) == 0.0
    assert round_half_away(-0.005) == -0.01
    assert round_half_away(0.125) == 0.13  # half away, not half even
    assert round_half_away(0.808) == 0.81
