"""Structural tests of the flattened taxonomy against reference semantics
(src/tree.rs:47-140)."""

import numpy as np

from raxtax_tpu.db.taxonomy import (
    NODE_INNER,
    NODE_SEQUENCE,
    NODE_TAXON,
    ROOT,
    build_taxonomy,
    sort_records,
)


def tax_from(lineages):
    sorted_l, _ = sort_records(lineages, [np.zeros(1, np.uint8)] * len(lineages))
    return build_taxonomy(sorted_l)


def test_basic_tree():
    # fixture from src/lineage.rs:191-207
    lineages = [
        "Animalia,Chordata,Mammalia,Primates,Hominidae,Homo",
        "Animalia,Chordata,Mammalia,Primates,Hominidae,Pan",
        "Animalia,Chordata,Mammalia,Carnivora,Canidae,Canis",
        "Animalia,Chordata,Mammalia,Carnivora,Felidae,Felis",
        "Animalia,Chordata,Mammalia,Carnivora,Felidae,Felis",
    ]
    t = tax_from(lineages)
    assert t.num_tips == 5
    # sorted order: Carnivora tips first (Canis=0, Felis=1,2), then Primates
    assert t.lineages[0].endswith("Canis")
    assert t.lineages[1].endswith("Felis")
    assert t.lineages[3].endswith("Homo")
    # root spans all tips
    assert (t.range_start[ROOT], t.range_end[ROOT]) == (0, 5)
    # one node labeled Mammalia spanning all 5 tips
    i = t.labels.index("Mammalia")
    assert (t.range_start[i], t.range_end[i]) == (0, 5)
    assert t.node_type[i] == NODE_INNER
    # Felis taxon node spans tips 1..3 and has two Sequence children
    f = t.labels.index("Felis")
    assert (t.range_start[f], t.range_end[f]) == (1, 3)
    assert t.node_type[f] == NODE_TAXON
    kids = t.children(f)
    assert len(kids) == 2
    assert all(t.node_type[k] == NODE_SEQUENCE for k in kids)
    assert (t.range_start[kids[0]], t.range_end[kids[0]]) == (1, 2)
    assert (t.range_start[kids[1]], t.range_end[kids[1]]) == (2, 3)
    # childless Sequence nodes are excluded from the eval view
    assert t.eval_pos[kids[0]] == -1
    # depths: root=0, Animalia=1, ..., species=6, sequence=7
    assert t.depth[f] == 6


def test_variable_depth_tree():
    # fixture from src/lineage.rs:243-251: lineages of different lengths
    lineages = [
        "Animalia,Chordata,Mammalia,Primates,Hominidae,Homo,Homo_sapiens",
        "Animalia,Chordata,Mammalia,Primates,Hominidae,Pan",
        "Animalia,Chordata,Mammalia,Carnivora,Canidae,Canis",
        "Animalia,Chordata,Mammalia,Carnivora,Doggo",
        "Animalia,Chordata,Mammalia,Mouse",
        "Animalia,Chordata,Mammalia,Carnivora,Felidae,Felis",
        "Animalia,Chordata,Mammalia,Carnivora,Felidae,Felis",
    ]
    t = tax_from(lineages)
    assert t.num_tips == 7
    d = t.labels.index("Doggo")
    assert t.node_type[d] == NODE_TAXON
    assert t.depth[d] == 5
    m = t.labels.index("Mouse")
    assert t.node_type[m] == NODE_TAXON
    assert t.depth[m] == 4
    carn = t.labels.index("Carnivora")
    # sorted: Canidae,Canis < Doggo < Felidae (C < D < F)
    assert (t.range_start[carn], t.range_end[carn]) == (0, 4)


def test_taxon_node_with_taxon_child():
    # lineage that is a strict prefix of another: "A,B" is its own Taxon node
    # AND an ancestor of "A,B,C"
    t = tax_from(["A,B", "A,B,C"])
    b = t.labels.index("B")
    assert t.node_type[b] == NODE_TAXON  # created by the shorter record first
    c = t.labels.index("C")
    assert t.parent[c] == b
    assert t.node_type[c] == NODE_TAXON
    # B's children: its own Sequence node, then C
    kids = t.children(b)
    assert t.node_type[kids[0]] == NODE_SEQUENCE
    assert kids[1] == c
    assert (t.range_start[b], t.range_end[b]) == (0, 2)
    assert (t.range_start[c], t.range_end[c]) == (1, 2)


def test_degenerate_label_equals_parent():
    # "A,B,B": the level-3 label matches the Sequence child label of "A,B".
    # The reference descends into the Sequence node (src/tree.rs:77-96);
    # we replicate that exactly.
    t = tax_from(["A,B", "A,B,B"])
    assert t.num_tips == 2
    b = t.labels.index("B")
    seq_b = t.children(b)[0]
    assert t.node_type[seq_b] == NODE_SEQUENCE
    assert (t.range_start[seq_b], t.range_end[seq_b]) == (0, 2)
    # it gained a Sequence child of its own, so it stays in the eval view
    assert len(t.children(seq_b)) == 1
    assert t.eval_pos[seq_b] != -1


def test_sibling_ranges_partition_parent():
    lineages = [f"P,x{i//3},s{i}" for i in range(30)]
    t = tax_from(lineages)
    for node in range(t.n_nodes):
        kids = t.children(node)
        if len(kids) == 0:
            continue
        assert t.range_start[kids[0]] == t.range_start[node]
        assert t.range_end[kids[-1]] == t.range_end[node]
        for a, b in zip(kids[:-1], kids[1:]):
            assert t.range_end[a] == t.range_start[b]


def test_unit_wide_arrays_partition():
    """unit/wide arrays partition the eval view exactly: every eval node is
    either some tip's unit entry (range length 1) or a wide entry, and the
    CSR groups ALL unit nodes of a tip (1-record chains stack several)."""
    import numpy as np

    from raxtax_tpu.db.taxonomy import build_taxonomy

    lineages = sorted(
        ["p:A,c:B,o:O,f:F1,g:G1,s:S1"] * 3  # multi-record species
        + ["p:A,c:B,o:O,f:F1,g:G2,s:S2"]  # 1-record chain under F1
        + ["p:A,c:B,o:O2,f:F2,g:G3,s:S3"]  # fully 1-record lineage
        + ["p:A,c:B,o:O2,f:F2,g:G3,s:S4"]
    )
    tax = build_taxonomy(lineages)
    ws, we, wp, uptr, uvals = tax.unit_wide_arrays()
    J = tax.eval_ids.shape[0]
    # partition: every eval position appears exactly once
    seen = np.concatenate([wp, uvals])
    assert sorted(seen.tolist()) == list(range(J))
    # wide nodes really span > 1 tip; unit nodes exactly 1
    assert ((we - ws) > 1).all()
    ids = tax.eval_ids
    for t in range(tax.num_tips):
        for p in uvals[uptr[t] : uptr[t + 1]]:
            n = ids[p]
            assert tax.range_start[n] == t and tax.range_end[n] == t + 1
