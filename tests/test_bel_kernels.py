"""Byte-level parity of the BEL kernels against the reference.

Goldens were produced by running the reference implementation
(transform_bel_statements.py:1-76, convert_to_cx2.py:11-47) over every
unique bel_statement in its published results/*/llm_results.json plus
hand-built edge cases; see tests/bel_golden.json / tests/label_golden.json.
"""
import json
import os

import pytest

from kgray.functions.bel import (
    annotation_url,
    split_statement,
    term_label,
    term_type,
)

HERE = os.path.dirname(__file__)


def load(name):
    with open(os.path.join(HERE, name)) as f:
        return json.load(f)


@pytest.mark.parametrize("stmt,expected", load("bel_golden.json"))
def test_split_statement_matches_reference(stmt, expected):
    expected = tuple(expected)
    if expected and expected[0] == "EXC":
        with pytest.raises(Exception):
            split_statement(stmt)
    else:
        assert split_statement(stmt) == expected


def test_label_and_type_match_reference():
    for term, label, typ in load("label_golden.json"):
        assert term_label(term) == label, term
        assert term_type(term) == typ, term


def test_annotation_url_rules():
    # grounding_genes.py:77-92: prefixed ids verbatim, else db:id join
    assert annotation_url("CHEBI", "CHEBI:15846") == (
        "https://identifiers.org/CHEBI:15846"
    )
    assert annotation_url("HP", "HP:6000040") == (
        "https://identifiers.org/HP:6000040"
    )
    assert annotation_url("HGNC", "14929") == (
        "https://identifiers.org/HGNC:14929"
    )
    assert annotation_url("", "123") == "https://identifiers.org/123"
    assert annotation_url("HGNC", "") == "https://identifiers.org/HGNC"
