"""Golden tests for FASTA parsing and database construction.

Expected values transcribed from the reference unit tests
(src/parser.rs:166-299). The reference's `k_mer_map` postings lists are
checked against our packed bit matrices.
"""

import numpy as np
import pytest

from raxtax_tpu.db.database import build_database, load_database, save_database
from raxtax_tpu.io.fasta import (
    FastaError,
    parse_query_fasta_str,
    parse_reference_fasta_str,
)

REF_FASTA = """>Badabing|Badabum;tax=p:Phylum1,c:Class1,o:Order1,f:Family1,g:Genus1,s:Species1;
AAACCCTTTGGGA
>Badabing|Badabum;tax=p:Phylum1,c:Class1,o:Order1,f:Family1,g:Genus1,s:Species2;
ATACGCTTTGGGA
>Badabing|Badabum;tax=p:Phylum1,c:Class1,o:Order4,f:Family5,g:Genus2,s:Species3;
ATCCGCTATGGGA
>Badabing|Badabum;tax=p:Phylum1,c:Class2,o:Order2,f:Family3,g:Genus3,s:Species6;
ATACGCTTTGCGT
>Badabing|Badabum;tax=p:Phylum1,c:Class1,o:Order1,f:Family1,g:Genus1,s:Species2;
GTGCGCTATGCGA
>Badabing|Badabum;tax=p:Phylum2,c:Class3,o:Order3,f:Family4,g:Genus4,s:Species5;
ATACGCTTTGCGT"""


def postings_ref_major(db, kmer):
    word, bit = kmer >> 5, kmer & 31
    col = (db.ref_major[:, word] >> np.uint32(bit)) & np.uint32(1)
    return np.nonzero(col)[0].tolist()


def postings_kmer_major(db, kmer):
    row = db.kmer_major[kmer]
    bits = (row[:, None] >> np.arange(32, dtype=np.uint32)) & np.uint32(1)
    return np.nonzero(bits.reshape(-1))[0].tolist()


def test_reference_parser_golden():
    # src/parser.rs:167-217
    records = parse_reference_fasta_str(REF_FASTA)
    db = build_database(records.lineages, records.sequences)
    assert db.num_tips == 6
    assert db.taxonomy.lineages == [
        "p:Phylum1,c:Class1,o:Order1,f:Family1,g:Genus1,s:Species1",
        "p:Phylum1,c:Class1,o:Order1,f:Family1,g:Genus1,s:Species2",
        "p:Phylum1,c:Class1,o:Order1,f:Family1,g:Genus1,s:Species2",
        "p:Phylum1,c:Class1,o:Order4,f:Family5,g:Genus2,s:Species3",
        "p:Phylum1,c:Class2,o:Order2,f:Family3,g:Genus3,s:Species6",
        "p:Phylum2,c:Class3,o:Order3,f:Family4,g:Genus4,s:Species5",
    ]
    for fn in (postings_ref_major, postings_kmer_major):
        assert fn(db, 0b1_0101_1111_1110) == [0]
        assert fn(db, 0b11_0001_1001_1111) == [1, 4, 5]
        assert fn(db, 0b110_0111_0011_1010) == [3]


def test_kmer_map_golden():
    # src/parser.rs:236-299
    fasta = """>A;tax=p:Phylum1,c:Class1,o:Order1,f:Family1,g:Genus1,s:Species1;
AAACCCCGT
>B;tax=p:Phylum1,c:Class1,o:Order1,f:Family1,g:Genus1,s:Species1;
TAACCCCGG
>C;tax=p:Phylum1,c:Class1,o:Order1,f:Family1,g:Genus2,s:Species3;
TTTAAAACC
>D;tax=p:Phylum1,c:Class1,o:Order1,f:Family1,g:Genus2,s:Species3;
TTTAAAACA
>E;tax=p:Phylum1,c:Class2,o:Order2,f:Family2,g:Genus3,s:Species4;
AAACCCCGG"""
    records = parse_reference_fasta_str(fasta)
    db = build_database(records.lineages, records.sequences)
    for fn in (postings_ref_major, postings_kmer_major):
        assert fn(db, 0b1_0101_0110) == [0, 4]
        assert fn(db, 0b101_0101_1010) == [1, 4]
        assert fn(db, 0b101_0101_1011) == [0]
        assert fn(db, 0b1100_0001_0101_0110) == [1]
        assert fn(db, 0b1111_0000_0000_0101) == [2]
        assert fn(db, 0b1111_1100_0000_0001) == [2, 3]


def test_query_parser():
    # src/parser.rs:220-233
    qs = parse_query_fasta_str(">label1\nAAACCCTTTGGGA")
    assert qs[0][0] == "label1"
    assert qs[0][1].tolist() == [1, 1, 1, 2, 2, 2, 8, 8, 8, 4, 4, 4, 1]
    # skip set filters by full label
    qs = parse_query_fasta_str(">a\nACGT\n>b\nACGT", queries_to_skip={"a"})
    assert [q[0] for q in qs] == ["b"]


def test_parser_errors():
    with pytest.raises(FastaError):
        parse_reference_fasta_str("")
    with pytest.raises(FastaError):
        parse_reference_fasta_str("ACGT\n>x;tax=a;")
    with pytest.raises(FastaError):
        parse_reference_fasta_str(">no taxonomy here\nACGT")


def test_comments_and_blank_lines():
    qs = parse_query_fasta_str("; comment\n\n>q1\nAC\nGT\n; mid\nAC")
    assert qs[0][0] == "q1"
    assert qs[0][1].tolist() == [1, 2, 4, 8, 1, 2]


def test_exact_match_map():
    records = parse_reference_fasta_str(REF_FASTA)
    db = build_database(records.lineages, records.sequences)
    from raxtax_tpu.utils.encoding import encode_sequence

    # ATACGCTTTGCGT appears twice (sorted tips 4 and 5)
    assert db.exact_matches(encode_sequence("ATACGCTTTGCGT")) == [4, 5]
    assert db.exact_matches(encode_sequence("AAACCCTTTGGGA")) == [0]
    assert db.exact_matches(encode_sequence("ACGTACGT")) == []


def test_db_roundtrip(tmp_path):
    records = parse_reference_fasta_str(REF_FASTA)
    db = build_database(records.lineages, records.sequences)
    path = tmp_path / "db.npz"
    save_database(db, path)
    db2 = load_database(path)
    assert db2.taxonomy.lineages == db.taxonomy.lineages
    assert (db2.ref_major == db.ref_major).all()
    assert (db2.kmer_major == db.kmer_major).all()
    assert db2.exact_map == db.exact_map
    np.testing.assert_array_equal(db2.taxonomy.range_start, db.taxonomy.range_start)
    np.testing.assert_array_equal(db2.taxonomy.range_end, db.taxonomy.range_end)
    np.testing.assert_array_equal(db2.taxonomy.node_type, db.taxonomy.node_type)


def test_db_v1_npz_still_loads(tmp_path):
    """Round-1 npz caches remain loadable (forward compatibility)."""
    records = parse_reference_fasta_str(REF_FASTA)
    db = build_database(records.lineages, records.sequences)
    tax = db.taxonomy
    path = tmp_path / "old.npz"
    np.savez(
        path,
        magic=np.array("raxtax-tpu-db"),
        version=np.array(1),
        lineage_blob=np.frombuffer(
            "\n".join(tax.lineages).encode(), dtype=np.uint8
        ),
        label_blob=np.frombuffer(
            "\n".join(tax.labels).encode(), dtype=np.uint8
        ),
        parent=tax.parent,
        depth=tax.depth,
        range_start=tax.range_start,
        range_end=tax.range_end,
        node_type=tax.node_type,
        num_tips=np.array(tax.num_tips),
        ref_major=db.ref_major,
        kmer_major=db.kmer_major,
        seq_flat=db.seq_flat,
        seq_offsets=db.seq_offsets,
    )
    db2 = load_database(path)
    assert db2.taxonomy.lineages == db.taxonomy.lineages
    assert (np.asarray(db2.kmer_major) == db.kmer_major).all()


def test_gzip_reference_fasta(tmp_path):
    """Gzipped FASTA input is read transparently (src/utils.rs:42-60)."""
    import gzip

    from raxtax_tpu.io.fasta import parse_reference_fasta_file

    content = ">r1;tax=p:A,s:X;\nACGTACGTACGT\n>r2;tax=p:A,s:Y;\nTTTTACGTACGT\n"
    p = tmp_path / "refs.fasta.gz"
    with gzip.open(p, "wt") as f:
        f.write(content)
    recs = parse_reference_fasta_file(p)
    assert recs.lineages == ["p:A,s:X", "p:A,s:Y"]
    assert len(recs.sequences) == 2
