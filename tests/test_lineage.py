"""Golden lineage-aggregation tests.

Fixtures and expected confidence vectors transcribed from the reference unit
tests (src/lineage.rs:182-335).
"""

import numpy as np

from raxtax_tpu.db.taxonomy import build_taxonomy, sort_records
from raxtax_tpu.lineage.evaluate import (
    EvaluationResult,
    euclidean_distance_l1,
    evaluate_dense,
)


def tax_from(lineages):
    sorted_l, _ = sort_records(lineages, [np.zeros(1, np.uint8)] * len(lineages))
    return build_taxonomy(sorted_l)


def run(lineages, probs):
    tax = tax_from(lineages)
    res = evaluate_dense(tax, "q", np.asarray(probs, dtype=np.float64))
    return [(r.lineage, r.confidence_values) for r in res]


def test_tree_construction_eval():
    # src/lineage.rs:192-239 — NOTE: confidence_values passed in *sorted tip
    # order* (the reference builds the tree first, then indexes tips by
    # sorted lineage order).
    lineages = [
        "Animalia,Chordata,Mammalia,Primates,Hominidae,Homo",
        "Animalia,Chordata,Mammalia,Primates,Hominidae,Pan",
        "Animalia,Chordata,Mammalia,Carnivora,Canidae,Canis",
        "Animalia,Chordata,Mammalia,Carnivora,Felidae,Felis",
        "Animalia,Chordata,Mammalia,Carnivora,Felidae,Felis",
    ]
    got = run(lineages, [0.1, 0.3, 0.4, 0.004, 0.004])
    assert got == [
        (
            "Animalia,Chordata,Mammalia,Carnivora,Felidae,Felis",
            [0.81, 0.81, 0.81, 0.8, 0.7, 0.7],
        ),
        (
            "Animalia,Chordata,Mammalia,Carnivora,Canidae,Canis",
            [0.81, 0.81, 0.81, 0.8, 0.1, 0.1],
        ),
        (
            "Animalia,Chordata,Mammalia,Primates,Hominidae,Pan",
            [0.81, 0.81, 0.81, 0.01, 0.01, 0.01],
        ),
    ]


def test_variable_lineage_length():
    # src/lineage.rs:242-302
    lineages = [
        "Animalia,Chordata,Mammalia,Primates,Hominidae,Homo,Homo_sapiens",
        "Animalia,Chordata,Mammalia,Primates,Hominidae,Pan",
        "Animalia,Chordata,Mammalia,Carnivora,Canidae,Canis",
        "Animalia,Chordata,Mammalia,Carnivora,Doggo",
        "Animalia,Chordata,Mammalia,Mouse",
        "Animalia,Chordata,Mammalia,Carnivora,Felidae,Felis",
        "Animalia,Chordata,Mammalia,Carnivora,Felidae,Felis",
    ]
    got = run(lineages, [0.05, 0.1, 0.3, 0.4, 0.1, 0.004, 0.004])
    assert got == [
        (
            "Animalia,Chordata,Mammalia,Carnivora,Felidae,Felis",
            [0.96, 0.96, 0.96, 0.85, 0.7, 0.7],
        ),
        (
            "Animalia,Chordata,Mammalia,Carnivora,Doggo",
            [0.96, 0.96, 0.96, 0.85, 0.1],
        ),
        (
            "Animalia,Chordata,Mammalia,Carnivora,Canidae,Canis",
            [0.96, 0.96, 0.96, 0.85, 0.05, 0.05],
        ),
        (
            "Animalia,Chordata,Mammalia,Mouse",
            [0.96, 0.96, 0.96, 0.1],
        ),
        (
            "Animalia,Chordata,Mammalia,Primates,Hominidae,Pan",
            [0.96, 0.96, 0.96, 0.01, 0.01, 0.01],
        ),
    ]


def test_likelihood_edge_case_fallback():
    # src/lineage.rs:305-334: nothing significant anywhere -> single
    # max-confidence path at 0.01 per level.
    lineages = [
        "Animalia,Chordata,Mammalia,Carnivora,Felidae,Felis",
        "Animalia,Chordata,Mammalia,Carnivora,Felidae,Felis_ferrocius",
        "Animalia,Chordata,Mammalia,Carnivora,Canidae,Canis",
    ]
    got = run(lineages, [0.004, 0.004, 0.004])
    assert got == [
        (
            "Animalia,Chordata,Mammalia,Carnivora,Felidae,Felis_ferrocius",
            [0.01, 0.01, 0.01, 0.01, 0.01, 0.01],
        ),
    ]


def test_output_formatting():
    r = EvaluationResult(
        query_label="q1",
        lineage="a,b,c",
        confidence_values=[1.0, 0.81, 0.005],
        local_signal=0.123456789,
        global_signal=0.0,
    )
    assert r.out_line() == "q1\ta,b,c\t1.00,0.81,0.01\t0.12346\t0.00000"
    assert (
        r.tsv_line("ACGT")
        == "q1\ta\t1.00\tb\t0.81\tc\t0.01\t0.12346\t0.00000\tACGT"
    )


def test_euclidean_distance_golden():
    # src/utils.rs:217-224
    assert abs(euclidean_distance_l1([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]) - np.sqrt(2)) < 1e-7
    assert (
        abs(
            euclidean_distance_l1([0.5, 0.1, 0.1], [1.0, 1.0, 0.5])
            - 0.4100771455544949
        )
        < 1e-7
    )


def test_signals_match_reference_structure():
    # local_signal starts at the first level where expected < 1.0
    lineages = ["A,B,C", "A,B,D"]
    tax = tax_from(lineages)
    res = evaluate_dense(tax, "q", np.array([0.9, 0.1]))
    top = res[0]
    # expected fractions: A=1.0, B=1.0, C=0.5 -> start index 2; both slices
    # are single elements -> normalized distance 0
    assert top.lineage == "A,B,C"
    assert top.local_signal == 0.0
    # global signal = ||p - 1/2||
    assert abs(top.global_signal - np.sqrt(2 * 0.4**2)) < 1e-12
