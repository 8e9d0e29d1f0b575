"""Deterministic synthetic corpus of interleaved text+media documents.

Generates the input table in the driver-mandated shape (BASELINE.json
input_hint): ``(doc_id: string, spans: list<struct<kind, text, media_ref,
offset>>)`` together with the gold triple set known by construction — the
stand-in for the reference's PubTator corpus + published llm_results.json
goldens (no external data in this sandbox).

Structure exercised per FIXTURES.md F1:
- text spans (paragraphs of planted relation/filler sentences),
- "title"/"ref" spans (reference drops these, pub.py:51-52),
- short text spans < 20 chars (dropped, pub.py:57-58),
- media spans interleaved (pass through untouched; never extracted from),
- at least one document with no relations at all (the "extract nothing"
  case, modeled on evaluation_tests_and_analysis/test_paper_dp.json entry 2),
- strictly increasing char offsets; span order is the per-row invariant.

Everything is a pure function of (seed, n_docs): two runs, two cluster
sizes, and the gold set always agree.
"""
from __future__ import annotations

import random
from typing import Dict, List, Tuple

import pyarrow as pa

from . import schemas
from .vocab import (
    ENTITIES,
    HOT_WEIGHTS,
    UNARY_VERB,
    RELATION_RULES,
    statement_for,
    unary_term,
    ENTITY_BY_NAME,
    bel_term,
)

_FILLERS = [
    "The samples were processed according to standard protocols.",
    "Further experiments are required to confirm these observations.",
    "These findings were consistent across replicates.",
    "Patient cohorts were stratified by age and treatment history.",
    "The measurements were repeated three times for robustness.",
    "Data were collected over a period of eighteen months.",
]

_CONTEXTS = ["", " in tumor cells", " under hypoxic conditions", " in vivo",
             " during early development", " in a dose-dependent manner"]

GOLD_EDGE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_seq", pa.int32()),
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("evidence", pa.string()),
    ]
)


def _pick_entity(rng: random.Random) -> str:
    return rng.choices(ENTITIES, weights=HOT_WEIGHTS, k=1)[0].entry_name


def _relation_sentence(rng: random.Random) -> Tuple[str, Tuple[str, str, str]]:
    subj = _pick_entity(rng)
    obj = _pick_entity(rng)
    while obj == subj:
        obj = _pick_entity(rng)
    rule = rng.choice(RELATION_RULES)
    ctx = rng.choice(_CONTEXTS)
    sentence = f"{subj} {rule.verb} {obj}{ctx}."
    stmt, s_term, rel, o_term = statement_for(subj, rule.verb, obj)
    return sentence, (s_term, rel, o_term)


def _unary_sentence(rng: random.Random) -> Tuple[str, str]:
    name = _pick_entity(rng)
    return f"{name} {UNARY_VERB}{rng.choice(_CONTEXTS)}.", unary_term(
        ENTITY_BY_NAME[name]
    )


def generate_documents(
    n_docs: int, seed: int = 42
) -> Tuple[pa.Table, pa.Table, pa.Table]:
    """Build (documents, gold_edges, gold_unary_nodes) Arrow tables.

    gold_unary_nodes: (doc_id, span_seq, name) — node-only records from unary
    statements, matching convert_to_cx2.py:92-101 semantics.
    """
    doc_ids: List[str] = []
    doc_spans: List[List[Dict]] = []
    g_doc, g_seq, g_s, g_p, g_o, g_ev = [], [], [], [], [], []
    u_doc, u_seq, u_name = [], [], []

    for d in range(n_docs):
        rng = random.Random((seed << 20) ^ d)
        doc_id = f"PMC{1000000 + d}"
        spans: List[Dict] = []
        offset = 0

        def add(kind: str, text: str, media_ref: str = "") -> int:
            nonlocal offset
            spans.append(
                {"kind": kind, "text": text, "media_ref": media_ref,
                 "offset": offset}
            )
            offset += max(len(text), 1) + 1
            return len(spans) - 1

        add("title", f"Study {d} of molecular interaction pathways")
        barren = d % 17 == 0  # the "extract nothing" documents

        n_paras = rng.randint(3, 8)
        for p in range(n_paras):
            if rng.random() < 0.25:
                add("media", "", f"synthetic://media/{doc_id}/{p}")
            if rng.random() < 0.15:
                add("text", f"Fig. {p}.")  # < 20 chars → dropped by admission
            sentences: List[str] = []
            planted: List[Tuple[str, Tuple[str, str, str]]] = []
            planted_unary: List[Tuple[str, str]] = []
            for _ in range(rng.randint(1, 3)):
                roll = rng.random()
                if barren or roll < 0.25:
                    sentences.append(rng.choice(_FILLERS))
                elif roll < 0.85:
                    sent, triple = _relation_sentence(rng)
                    sentences.append(sent)
                    planted.append((sent, triple))
                else:
                    sent, term = _unary_sentence(rng)
                    sentences.append(sent)
                    planted_unary.append((sent, term))
            text = " ".join(sentences)
            seq = add("text", text)
            if len(text) >= 20:  # mirrors the admission filter the gold obeys
                for sent, (s_term, rel, o_term) in planted:
                    g_doc.append(doc_id)
                    g_seq.append(seq)
                    g_s.append(s_term)
                    g_p.append(rel)
                    g_o.append(o_term)
                    g_ev.append(sent)
                for sent, term in planted_unary:
                    u_doc.append(doc_id)
                    u_seq.append(seq)
                    u_name.append(term)
        if rng.random() < 0.5:
            add("ref", "1. Smith J et al. A reference entry that is long enough.")
        doc_ids.append(doc_id)
        doc_spans.append(spans)

    documents = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": doc_spans}, schema=schemas.DOCUMENTS
    )
    gold_edges = pa.Table.from_pydict(
        {
            "doc_id": g_doc,
            "span_seq": pa.array(g_seq, pa.int32()),
            "subj": g_s,
            "pred": g_p,
            "obj": g_o,
            "evidence": g_ev,
        },
        schema=GOLD_EDGE_SCHEMA,
    )
    gold_unary = pa.Table.from_pydict(
        {
            "doc_id": u_doc,
            "span_seq": pa.array(u_seq, pa.int32()),
            "name": u_name,
        }
    )
    return documents, gold_edges, gold_unary


def write_corpus(out_dir: str, n_docs: int, seed: int = 42) -> Dict[str, str]:
    """Write documents/gold parquet under ``out_dir``; returns paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    docs, gold_edges, gold_unary = generate_documents(n_docs, seed)
    paths = {}
    for name, tbl in [
        ("documents", docs),
        ("gold_edges", gold_edges),
        ("gold_unary", gold_unary),
    ]:
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths
