"""Extraction rows → edge rows (+ URL-enriched annotation rows).

Reference semantics being re-expressed:
- grounding_genes.py:55-105 ``process_annotations``: drop extractions with
  empty Results; map each annotation to (entry_name, identifiers.org URL).
- transform_bel_statements.py:79-105 ``process_llm_results``: split each
  bel_statement; keep only fully binary splits as edges; annotations become
  node-annotation records.
- convert_to_cx2.py:114-121: edge attributes source_label / target_label /
  bel_expression = "{subj} {pred} {obj}".

Here the interleaved record list becomes two clean tables: ``edges`` (EDGES
schema) and ``annotation_urls`` (doc_id, span_seq, ann_seq, entry_name, url).
Both are per-row transforms → stateless ``map_batches`` tasks.
"""
from __future__ import annotations

from typing import List

import pyarrow as pa
import pyarrow.compute as pc

from .. import schemas
from ..functions.bel import annotation_url, split_statement, term_label


def filter_nonempty_results(batch: pa.Table) -> pa.Table:
    """Drop rows whose Results list is empty (grounding_genes.py:63-66)."""
    n = pc.list_value_length(batch.column("results"))
    return batch.filter(pc.and_(pc.is_valid(n), pc.greater(n, 0)))


def extractions_to_edges(batch: pa.Table) -> pa.Table:
    """Explode results into edge rows; unary/partial splits are skipped
    (transform_bel_statements.py:87-95 keeps only fully binary parses)."""
    doc_ids = batch.column("doc_id").to_pylist()
    seqs = batch.column("span_seq").to_pylist()
    texts = batch.column("text").to_pylist()
    results = batch.column("results").to_pylist()
    o_doc: List[str] = []
    o_seq: List[int] = []
    o_stmt: List[int] = []
    o = {k: [] for k in ("subj", "pred", "obj", "text", "evidence",
                         "subj_label", "obj_label", "bel_expression")}
    for did, seq, text, res in zip(doc_ids, seqs, texts, results):
        for si, r in enumerate(res or []):
            subj, rel, obj = split_statement(r["bel_statement"] or "")
            if not (subj and rel and obj):
                continue
            o_doc.append(did)
            o_seq.append(seq)
            o_stmt.append(si)
            o["subj"].append(subj)
            o["pred"].append(rel)
            o["obj"].append(obj)
            o["text"].append(text)
            o["evidence"].append(r["evidence"])
            o["subj_label"].append(term_label(subj))
            o["obj_label"].append(term_label(obj))
            o["bel_expression"].append(f"{subj} {rel} {obj}")
    out = pa.table(
        {
            "doc_id": pa.array(o_doc, pa.string()),
            "span_seq": pa.array(o_seq, pa.int32()),
            "stmt_seq": pa.array(o_stmt, pa.int32()),
            **{k: pa.array(v, pa.string()) for k, v in o.items()},
        }
    )
    return schemas.validate_schema(out, schemas.EDGES, "edges")


def extractions_to_unary_nodes(batch: pa.Table) -> pa.Table:
    """Node-only records from unary statements (convert_to_cx2.py:92-101)."""
    doc_ids = batch.column("doc_id").to_pylist()
    seqs = batch.column("span_seq").to_pylist()
    results = batch.column("results").to_pylist()
    o_doc, o_seq, o_stmt, o_name = [], [], [], []
    for did, seq, res in zip(doc_ids, seqs, results):
        for si, r in enumerate(res or []):
            subj, rel, obj = split_statement(r["bel_statement"] or "")
            if subj and rel is None and obj is None:
                o_doc.append(did)
                o_seq.append(seq)
                o_stmt.append(si)
                o_name.append(subj)
    return pa.table(
        {
            "doc_id": pa.array(o_doc, pa.string()),
            "span_seq": pa.array(o_seq, pa.int32()),
            "stmt_seq": pa.array(o_stmt, pa.int32()),
            "name": pa.array(o_name, pa.string()),
        }
    )


def extractions_to_annotation_urls(batch: pa.Table) -> pa.Table:
    """Annotation URL records, in encounter order (grounding_genes.py:77-92).

    ``ann_seq`` preserves within-paragraph annotation order so the global
    first-seen URL-per-entry_name rule (convert_to_cx2.py:78-82) can be
    reproduced with a deterministic min-by-(doc_id, span_seq, ann_seq)
    aggregate instead of arrival order.
    """
    batch = filter_nonempty_results(batch)
    doc_ids = batch.column("doc_id").to_pylist()
    seqs = batch.column("span_seq").to_pylist()
    anns = batch.column("annotations").to_pylist()
    o_doc, o_seq, o_ann, o_name, o_url = [], [], [], [], []
    for did, seq, alist in zip(doc_ids, seqs, anns):
        for i, a in enumerate(alist or []):
            o_doc.append(did)
            o_seq.append(seq)
            o_ann.append(i)
            o_name.append(a["entry_name"])
            o_url.append(annotation_url(a.get("db", ""), a.get("id", "")))
    return pa.table(
        {
            "doc_id": pa.array(o_doc, pa.string()),
            "span_seq": pa.array(o_seq, pa.int32()),
            "ann_seq": pa.array(o_ann, pa.int32()),
            "entry_name": pa.array(o_name, pa.string()),
            "url": pa.array(o_url, pa.string()),
        }
    )
