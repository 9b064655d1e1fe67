"""The reference database: taxonomy + bit matrices + exact-match map.

TPU-native equivalent of the reference `Tree` aggregate (src/tree.rs:36-43):
`root`/`lineages` become the flattened :class:`Taxonomy`, `k_mer_map` becomes
the packed bit matrices, `sequences` becomes a host hash map from encoded
sequence bytes to tip ids. Persisted as an uncompressed ``.npz`` (the
binary-DB cache, mirroring the bincode fast path at src/tree.rs:147-164 and
src/parser.rs:38-40).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from . import bitmatrix
from .taxonomy import Taxonomy, build_taxonomy, sort_records

DB_FORMAT_VERSION = 1
DB_MAGIC = "raxtax-tpu-db"


@dataclass
class Database:
    taxonomy: Taxonomy
    ref_major: np.ndarray  #: [num_tips, 2048] uint32
    kmer_major: np.ndarray  #: [65537, ceil(num_tips/32)] uint32
    seq_flat: np.ndarray  #: uint8, concatenated 4-bit-encoded sequences
    seq_offsets: np.ndarray  #: int64 [num_tips+1]
    exact_map: dict[bytes, list[int]]  #: encoded sequence -> sorted tip ids

    @property
    def num_tips(self) -> int:
        return self.taxonomy.num_tips

    def sequence(self, tip: int) -> np.ndarray:
        return self.seq_flat[self.seq_offsets[tip] : self.seq_offsets[tip + 1]]

    def exact_matches(self, encoded_query: np.ndarray) -> list[int]:
        """Tip ids of references whose sequence equals the query byte-wise
        (reference: src/raxtax.rs:42; empty list when absent)."""
        return self.exact_map.get(encoded_query.tobytes(), [])


def _build_exact_map(seq_flat, seq_offsets, num_tips) -> dict[bytes, list[int]]:
    m: dict[bytes, list[int]] = {}
    for tip in range(num_tips):
        key = seq_flat[seq_offsets[tip] : seq_offsets[tip + 1]].tobytes()
        m.setdefault(key, []).append(tip)
    return m


def build_database(
    lineages: list[str], sequences: list[np.ndarray], threads: int = 0
) -> Database:
    """Build the full database from raw (file-order) records.

    Mirrors `Tree::new` (src/tree.rs:47-140): stable lineage sort, flattened
    tree, exact-match map keyed by encoded sequence, packed k-mer presence.
    `threads` sizes the native bit-matrix worker pool (0 = all cores),
    mirroring -t/--threads -> rayon (src/main.rs:119-124).
    """
    if len(lineages) != len(sequences):
        raise ValueError("lineage/sequence count mismatch")
    if len(lineages) >= 2**31:
        raise ValueError("Too many database sequences for 32-bit indices")
    sorted_lineages, sorted_seqs = sort_records(lineages, sequences)
    taxonomy = build_taxonomy(sorted_lineages)
    num = len(sorted_seqs)
    seq_offsets = np.zeros(num + 1, dtype=np.int64)
    seq_offsets[1:] = np.cumsum([s.shape[0] for s in sorted_seqs])
    seq_flat = (
        np.concatenate(sorted_seqs) if num else np.empty(0, np.uint8)
    ).astype(np.uint8)
    from .. import native

    mats = native.build_bit_matrices(sorted_seqs, threads=threads)
    if mats is not None:
        ref_major, kmer_major = mats
    else:
        ref_ids, kmers = bitmatrix.distinct_kmers_per_ref(sorted_seqs)
        ref_major = bitmatrix.build_ref_major(ref_ids, kmers, num)
        kmer_major = bitmatrix.build_kmer_major(ref_ids, kmers, num)
    return Database(
        taxonomy=taxonomy,
        ref_major=ref_major,
        kmer_major=kmer_major,
        seq_flat=seq_flat,
        seq_offsets=seq_offsets,
        exact_map=_build_exact_map(seq_flat, seq_offsets, num),
    )


def save_database(db: Database, path: str | Path) -> None:
    """Persist as uncompressed npz (binary DB cache; cf. src/tree.rs:147-153)."""
    tax = db.taxonomy
    lineage_blob = "\n".join(tax.lineages).encode("utf-8")
    label_blob = "\n".join(tax.labels).encode("utf-8")
    np.savez(
        path if str(path).endswith(".npz") else str(path),
        magic=np.array(DB_MAGIC),
        version=np.array(DB_FORMAT_VERSION),
        lineage_blob=np.frombuffer(lineage_blob, dtype=np.uint8),
        label_blob=np.frombuffer(label_blob, dtype=np.uint8),
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


def load_database(path: str | Path) -> Database:
    """Load a binary DB; raises on anything that isn't one
    (the caller falls back to FASTA parsing, cf. src/parser.rs:38-40)."""
    with np.load(path, allow_pickle=False) as z:
        if str(z["magic"]) != DB_MAGIC:
            raise ValueError("not a raxtax-tpu database")
        version = int(z["version"])
        if version != DB_FORMAT_VERSION:
            raise ValueError(f"unsupported database version {version}")
        lineages = bytes(z["lineage_blob"]).decode("utf-8").split("\n")
        labels = bytes(z["label_blob"]).decode("utf-8").split("\n")
        num_tips = int(z["num_tips"])
        if num_tips == 0:
            lineages = []
        taxonomy = Taxonomy(
            lineages=lineages,
            labels=labels,
            parent=z["parent"],
            depth=z["depth"],
            range_start=z["range_start"],
            range_end=z["range_end"],
            node_type=z["node_type"],
            num_tips=num_tips,
        )
        seq_flat = z["seq_flat"]
        seq_offsets = z["seq_offsets"]
        return Database(
            taxonomy=taxonomy,
            ref_major=z["ref_major"],
            kmer_major=z["kmer_major"],
            seq_flat=seq_flat,
            seq_offsets=seq_offsets,
            exact_map=_build_exact_map(seq_flat, seq_offsets, num_tips),
        )


def load_or_parse_database(
    path: str | Path, threads: int = 0
) -> tuple[bool, Database]:
    """Binary-DB fast path with FASTA fallback (src/parser.rs:36-44).

    Returns (parsed_from_fasta, db)."""
    try:
        return False, load_database(path)
    except Exception:
        pass
    from ..io.fasta import parse_reference_fasta_file

    records = parse_reference_fasta_file(path)
    return True, build_database(
        records.lineages, records.sequences, threads=threads
    )
