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


def test_bit_matrices_threaded_identical(lib, seqs):
    # 5 threads on 66 sequences: uneven split + a partial 32-block per
    # worker; output must be bit-identical to the single-thread build
    r1, k1 = native.build_bit_matrices(seqs, threads=1)
    r5, k5 = native.build_bit_matrices(seqs, threads=5)
    np.testing.assert_array_equal(r1, r5)
    np.testing.assert_array_equal(k1, k5)


def test_tip_cumsum_planes4_matches_numpy(lib):
    rng = np.random.default_rng(11)
    num_tips = 5000
    n_pad = 1 * 128 * 32  # S=1 -> 4096... use S=2
    S = 2
    n_pad = S * 128 * 32
    counts = np.zeros(n_pad, np.int64)
    counts[:num_tips] = rng.integers(0, 40, size=num_tips)
    from tests.test_planes import encode_planes

    planes = encode_planes(counts[None, :], n_planes=6)[0]
    lo4 = planes[:4]
    over = np.nonzero(counts > 15)[0]
    over_idx = over.astype(np.int32)
    over_val = counts[over].astype(np.uint16)
    table = rng.random(64)
    cum = native.tip_cumsum_planes4(
        lo4, over_idx, over_val, len(over), table, num_tips
    )
    expect = np.concatenate(([0.0], np.cumsum(table[counts[:num_tips]])))
    np.testing.assert_array_equal(cum, expect)


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


def test_parse_fasta_matches_python(lib):
    from raxtax_tpu.io.fasta import (
        parse_query_fasta_str,
        parse_reference_fasta_str,
    )

    content = (
        "; a comment line\n"
        "\n"
        ">r1 info tax=p:A,c:B,s:X; more\n"
        "ACGTacgt\nNNWW\n"
        ">r2;tax=p:A,s:Y;\n"
        "ttkkmm\n"
        ">r3 tax=;junk tax=p:B,s:Z;\n"
        "GGGG\n"
    )
    want = parse_reference_fasta_str(content)
    got = native.parse_fasta(content.encode(), with_tax=True)
    assert got is not None
    labels, seqs = got
    assert labels == want.lineages
    assert len(seqs) == len(want.sequences)
    for a, b in zip(seqs, want.sequences):
        np.testing.assert_array_equal(a, b)

    qcontent = ">q1 full label\nACGT\n>skipme\nAC\n>q2\n>q3\nGGTT\nCC\n"
    wantq = parse_query_fasta_str(qcontent)
    gotq = native.parse_fasta(qcontent.encode(), with_tax=False)
    assert gotq is not None
    labels, seqs = gotq
    assert labels == [l for l, _ in wantq]
    for (_, b), a in zip(wantq, seqs):
        np.testing.assert_array_equal(a, b)

    # error inputs -> None (Python path produces the message)
    assert native.parse_fasta(b"not fasta\n", with_tax=True) is None
    assert native.parse_fasta(b">r1 no tax\nACGT\n", with_tax=True) is None
    assert native.parse_fasta(b">r1 tax=p:A;\nACGTZ\n", with_tax=True) is None
    assert native.parse_fasta(
        b">a tax=x;\n>b tax=y;\nACGT\n", with_tax=True
    ) is None


def test_descend_planes4_batch_matches_python(lib):
    """Batched native descents == per-query python replay (exact f64 cums,
    Rust max_by last-max ties — src/lineage.rs:151-177), including exact
    ties from duplicated count patterns."""
    from raxtax_tpu.db.database import build_database
    from raxtax_tpu.db.taxonomy import NODE_INNER
    from tests.test_planes import encode_planes

    rng = np.random.default_rng(23)
    lineages, seqs_db = [], []
    for f in range(6):
        for s in range(8):
            for r in range(3):
                lineages.append(
                    f"p:A,c:B,o:O{f % 2},f:F{f},g:G{f}_{s % 3},s:S{f}_{s}"
                )
                codes = encode_sequence(
                    "".join(
                        BASES[b] for b in rng.integers(0, 4, size=60)
                    )
                )
                seqs_db.append(codes)
    db = build_database(lineages, seqs_db, with_ref_major=False)
    tax = db.taxonomy
    num_tips = db.num_tips
    S = (num_tips + 32 * 128 - 1) // (32 * 128)
    n_pad = S * 128 * 32

    n_rows = 5
    counts = np.zeros((n_rows, n_pad), np.int64)
    counts[:, :num_tips] = rng.integers(0, 20, size=(n_rows, num_tips))
    # force exact ties: rows 1/3 duplicate whole family blocks
    counts[1, :num_tips] = np.tile(
        counts[1, : num_tips // 6], 6
    )[:num_tips]
    planes = encode_planes(counts, n_planes=6)
    lo4 = np.ascontiguousarray(planes[:, :4])
    budget = 64
    over_idx = np.full((n_rows, budget), -1, np.int32)
    over_val = np.zeros((n_rows, budget), np.uint16)
    n_over = np.zeros(n_rows, np.int64)
    for r in range(n_rows):
        ov = np.nonzero(counts[r] > 15)[0]
        assert ov.size <= budget
        over_idx[r, : ov.size] = ov
        over_val[r, : ov.size] = counts[r, ov]
        n_over[r] = ov.size
    tables = [rng.random(32) for _ in range(n_rows)]

    # sites: every row descends from the root and one random inner node
    inner = np.nonzero(tax.node_type == NODE_INNER)[0]
    rows, nodes = [], []
    for r in range(n_rows):
        rows += [r, r]
        nodes += [0, int(rng.choice(inner))]
    rows = np.asarray(rows, np.int32)
    nodes = np.asarray(nodes, np.int32)

    got = native.descend_planes4_batch(
        lo4, over_idx, over_val, n_over, tables, rows, nodes, num_tips,
        tax.range_start, tax.range_end, tax.child_ptr, tax.child_ids,
        tax.node_type,
    )
    assert got is not None

    # python reference: exact sequential-f64 cum + last-max descents
    for i, (r, start) in enumerate(zip(rows, nodes)):
        tipp = tables[r][counts[r, :num_tips]]
        cum = np.concatenate(([0.0], np.cumsum(tipp)))
        cur = int(start)
        while tax.node_type[cur] == NODE_INNER:
            kids = tax.children(cur)
            v = cum[tax.range_end[kids]] - cum[tax.range_start[kids]]
            best = len(v) - 1 - int(np.argmax(v[::-1]))
            cur = int(kids[best])
        assert got[i] == cur, f"site {i}: native {got[i]} python {cur}"
