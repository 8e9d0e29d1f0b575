"""MESH filter (M4), simplify_annotations (M5), reviewer consensus (G7),
entity faithfulness (G6)."""
import pyarrow as pa

from kgray.eval.compare import (
    entity_faithfulness,
    reviewer_consensus,
    simplify_annotations,
)
from kgray.stages.annotate import DictionaryAnnotator


def test_mesh_filter_flag():
    text = "TP53 and breast carcinoma were observed."
    base = DictionaryAnnotator().annotate_text(text)
    assert {"MESH"} <= {a["db"] for a in base}  # production path keeps MESH
    filtered = DictionaryAnnotator(drop_dbs={"MESH", "MESHD"}).annotate_text(
        text
    )
    assert {a["db"] for a in filtered} == {"HGNC"}


def test_simplify_annotations():
    anns = [
        {"db": "HGNC", "id": "391", "entry_name": "AKT1"},
        {"db": "GO", "id": "0006915", "entry_name": "apoptotic process"},
    ]
    assert simplify_annotations(anns) == [
        "HGNC:AKT1", "GO:apoptotic process",
    ]


def test_reviewer_consensus():
    votes = {
        "s1": ["ok", "ok", "ok", "bad-rel", "ok"],
        "s2": ["bad-ent", "bad-rel", "ok", "bad-ent", "missing"],
        "s3": [],
    }
    out = reviewer_consensus(votes, majority=3)
    assert out["s1"]["consensus"] and out["s1"]["top"] == "ok"
    assert not out["s2"]["consensus"] and out["s2"]["top_count"] == 2
    assert not out["s3"]["consensus"]


def test_entity_faithfulness_classes():
    anns = [{"db": "HGNC", "id": "391", "entry_name": "AKT1"}]
    r = entity_faithfulness(["p(HGNC:AKT1) increases p(HGNC:MTOR)"], anns)
    assert r["correct"] == 1 and r["manufactured"] == 1
    r2 = entity_faithfulness(["p(FPLX:AKT1)"], anns)
    assert r2["wrong_namespace"] == 1
    assert r2["overall_score"] == 0.0
    r3 = entity_faithfulness([], anns)
    assert r3["overall_score"] == 1.0
