"""Adapter: generic (doc_id, text) tables → the KG pipeline's input shape.

Turns the driver's flat documents table into the input_hint documents shape
(doc_id string, spans list<struct>) by fixed-width word chunking, and
provides a SQL-mirrorable extraction backend (consecutive co-occurring
vocabulary terms) so the ENTIRE KG pipeline — chunk → annotate → extract →
parse → edges — can be verified against a DuckDB oracle on driver data.

The real (reference-semantics) corpus lives in kgray.corpus; this adapter
exists so the same pipeline code is exercised on the driver's tables with
an exact relational oracle.
"""
from __future__ import annotations

from typing import List

import pyarrow as pa
import ray
import ray.data

from ..vocab import Entity

WORDS_PER_SPAN = 20

# fixed vocabulary present in the driver's synthetic documents text
GENERIC_VOCAB: List[str] = [
    "spark", "table", "row", "hash", "join", "scan", "filter", "sort",
    "merge", "window", "stream", "vector", "column", "batch", "query",
    "group", "order", "line", "value", "data",
]

GENERIC_ENTITIES = {
    w: Entity(entry_name=w, db="X", id=w, fn="w") for w in GENERIC_VOCAB
}


def doc_key(doc_id: int) -> str:
    """int64 doc_id → lexicographically ordered string key."""
    return f"D{doc_id:08d}"


def table_to_documents(batch: pa.Table) -> pa.Table:
    """(doc_id:int64, text) → (doc_id:string, spans) with fixed-width word
    chunks (WORDS_PER_SPAN tokens per span, single-space tokenization —
    mirrored 1:1 by the SQL oracle's string_split + floor((i-1)/20))."""
    from .. import schemas

    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_ids, out_spans = [], []
    for d, t in zip(doc_ids, texts):
        toks = (t or "").split(" ")
        spans = []
        offset = 0
        for s in range(0, len(toks), WORDS_PER_SPAN):
            chunk = " ".join(toks[s : s + WORDS_PER_SPAN])
            spans.append(
                {"kind": "text", "text": chunk, "media_ref": "",
                 "offset": offset}
            )
            offset += len(chunk) + 1
        out_ids.append(doc_key(d))
        out_spans.append(spans)
    return pa.Table.from_pydict(
        {"doc_id": out_ids, "spans": out_spans}, schema=schemas.DOCUMENTS
    )


class CooccurrenceBackend:
    """Extraction backend for generic corpora: each consecutive pair of
    annotations (in appearance order) becomes ``w(X:a) cooccurs w(X:b)``.

    Pure function of (text, annotations) → SQL-expressible with a window
    lead() over vocabulary token positions.  ``simulate_ms_per_doc`` as in
    StubBackend (benchmark-only calibrated inference cost; results
    unchanged).
    """

    def __init__(self, simulate_ms_per_doc: float = 0.0):
        self._sim_s = simulate_ms_per_doc / 1000.0

    def _burn(self) -> None:
        import time

        end = time.perf_counter() + self._sim_s
        x = 0
        while time.perf_counter() < end:
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF

    def extract_batch(self, texts, annotations):
        out = []
        for text, anns in zip(texts, annotations):
            if self._sim_s:
                self._burn()
            names = [a["entry_name"] for a in anns]
            res = [
                {
                    "bel_statement": f"w(X:{a}) cooccurs w(X:{b})",
                    "evidence": text,
                }
                for a, b in zip(names, names[1:])
            ]
            out.append(res)
        return out


def generic_documents_dataset(sf_dir: str) -> "ray.data.Dataset":
    import os

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(table_to_documents, batch_format="pyarrow")


def generic_kg_config(simulate_ms_per_doc: float = 0.0):
    from ..pipelines.kg import KGConfig

    cfg = KGConfig()
    cfg.backend = CooccurrenceBackend(simulate_ms_per_doc)
    cfg.annotator_kwargs = {"vocab": GENERIC_ENTITIES}
    return cfg
