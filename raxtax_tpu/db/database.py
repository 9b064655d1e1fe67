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


RXDB_MAGIC = b"RXDB0002"
_RXDB_ALIGN = 4096


def save_database(db: Database, path: str | Path) -> None:
    """Persist the binary DB cache (cf. src/tree.rs:147-153).

    Format v2: one file — a JSON header (array names, dtypes, shapes,
    offsets) followed by page-aligned raw array bytes. Unlike the v1 npz
    (a zip container that must be streamed through a decompressor), every
    array is `np.memmap`-addressable: loading a multi-GB database costs
    milliseconds, pages fault in lazily, and backends that never touch an
    array (the pallas path never reads the 8 GB ref-major matrix) never
    pay its IO.
    """
    import json

    tax = db.taxonomy
    lineage_blob = np.frombuffer(
        "\n".join(tax.lineages).encode("utf-8"), dtype=np.uint8
    )
    label_blob = np.frombuffer(
        "\n".join(tax.labels).encode("utf-8"), dtype=np.uint8
    )
    arrays = {
        "lineage_blob": lineage_blob,
        "label_blob": label_blob,
        "parent": tax.parent,
        "depth": tax.depth,
        "range_start": tax.range_start,
        "range_end": tax.range_end,
        "node_type": tax.node_type,
        "seq_offsets": db.seq_offsets,
        "seq_flat": db.seq_flat,
        "kmer_major": db.kmer_major,
        "ref_major": db.ref_major,
    }
    entries = {}
    # header is padded to one page; arrays start page-aligned after it
    offset = _RXDB_ALIGN
    for name, arr in arrays.items():
        arr = np.ascontiguousarray(arr)
        arrays[name] = arr
        entries[name] = {
            "dtype": arr.dtype.str,
            "shape": list(arr.shape),
            "offset": offset,
        }
        offset += (arr.nbytes + _RXDB_ALIGN - 1) // _RXDB_ALIGN * _RXDB_ALIGN
    header = json.dumps(
        {
            "magic": DB_MAGIC,
            "version": 2,
            "num_tips": int(tax.num_tips),
            "arrays": entries,
        }
    ).encode("utf-8")
    assert len(header) + len(RXDB_MAGIC) < _RXDB_ALIGN, "header too large"
    with open(path, "wb") as f:
        f.write(RXDB_MAGIC)
        f.write(header)
        for name, arr in arrays.items():
            f.seek(entries[name]["offset"])
            arr.tofile(f)
        f.truncate(offset)


def _load_database_v2(path: str | Path) -> Database:
    import json

    with open(path, "rb") as f:
        head = f.read(_RXDB_ALIGN)
    if not head.startswith(RXDB_MAGIC):
        raise ValueError("not a raxtax-tpu v2 database")
    meta = json.loads(head[len(RXDB_MAGIC) :].split(b"\x00", 1)[0])
    if meta.get("magic") != DB_MAGIC or meta.get("version") != 2:
        raise ValueError("unsupported database header")

    def arr(name, mmap=True):
        e = meta["arrays"][name]
        shape = tuple(e["shape"])
        if mmap:
            return np.memmap(
                path, dtype=np.dtype(e["dtype"]), mode="r",
                offset=e["offset"], shape=shape,
            )
        with open(path, "rb") as f:
            f.seek(e["offset"])
            return np.fromfile(
                f, dtype=np.dtype(e["dtype"]),
                count=int(np.prod(shape)) if shape else 1,
            ).reshape(shape)

    num_tips = int(meta["num_tips"])
    lineages = bytes(arr("lineage_blob", mmap=False)).decode("utf-8").split("\n")
    labels = bytes(arr("label_blob", mmap=False)).decode("utf-8").split("\n")
    if num_tips == 0:
        lineages = []
    taxonomy = Taxonomy(
        lineages=lineages,
        labels=labels,
        parent=arr("parent", mmap=False),
        depth=arr("depth", mmap=False),
        range_start=arr("range_start", mmap=False),
        range_end=arr("range_end", mmap=False),
        node_type=arr("node_type", mmap=False),
        num_tips=num_tips,
    )
    seq_flat = arr("seq_flat", mmap=False)
    seq_offsets = arr("seq_offsets", mmap=False)
    return Database(
        taxonomy=taxonomy,
        ref_major=arr("ref_major"),  # lazy: pallas runs never read it
        kmer_major=arr("kmer_major"),
        seq_flat=seq_flat,
        seq_offsets=seq_offsets,
        exact_map=_build_exact_map(seq_flat, seq_offsets, num_tips),
    )


def load_database(path: str | Path) -> Database:
    """Load a binary DB (v2 page-aligned mmap format, or the round-1 npz);
    raises on anything that isn't one (the caller falls back to FASTA
    parsing, cf. src/parser.rs:38-40)."""
    with open(path, "rb") as f:
        if f.read(len(RXDB_MAGIC)) == RXDB_MAGIC:
            return _load_database_v2(path)
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
