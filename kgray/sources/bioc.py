"""BioC / PubTator XML ingestion.

Reference semantics: pub.py:29-66 (``get_pubtator_paragraphs``) — iterate
``.//passage`` elements of a PubTator BioC XML export, skip passages whose
``infon[@key="section_type"]`` lowercases to ``ref`` or ``title``, strip
the passage ``<text>``, skip texts shorter than 20 chars, and number the
survivors 0..n-1 in document order.  (The reference's download step,
pub.py:7-26, is an HTTP fetch of the same XML — out of scope in this
sandbox; the parse is the portable kernel.)

Ray-Data shape: ``bioc_xml_to_document`` turns one XML payload into one
DOCUMENTS row (doc_id, spans) carrying EVERY passage as a span — admitted
filtering happens downstream in ``stages.chunk.explode_spans``, whose
admission flag (kind ∉ {ref, title} ∧ len ≥ 20) reproduces pub.py:51-58
exactly.  ``BiocReader`` is the map_batches stage over a dataset of
(doc_id, xml) rows; feed it from ``read_text``/``read_binary_files`` over
an XML directory, or any table with an xml column.

Passage annotations (``<annotation>`` elements with MESH/Gene infons) are
intentionally not consumed here: grounding is the annotator stage's job
(stages/annotate.py), mirroring the reference where gilda re-annotates the
extracted paragraphs rather than trusting PubTator's.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List

import pyarrow as pa

_DROP_SECTIONS = ("ref", "title")  # pub.py:51-52
_MIN_TEXT_LEN = 20                 # pub.py:57-58


def parse_pubtator_paragraphs(xml_text: str) -> Dict[str, Dict[str, str]]:
    """Byte-parity port of pub.py:29-66: {paragraph_number: {"text": ...}}.

    Used by the golden tests against the reference's own
    ``*_pub_paragraphs.json`` artifacts; the pipeline path goes through
    ``bioc_xml_to_spans`` + explode_spans instead.
    """
    root = ET.fromstring(xml_text)
    out: Dict[str, Dict[str, str]] = {}
    n = 0
    for passage in root.iter("passage"):
        section_type = (
            passage.findtext('infon[@key="section_type"]', "") or ""
        ).lower()
        if section_type in _DROP_SECTIONS:
            continue
        text_elem = passage.find("text")
        text = (
            text_elem.text.strip()
            if text_elem is not None and text_elem.text
            else ""
        )
        if len(text) < _MIN_TEXT_LEN:
            continue
        out[str(n)] = {"text": text}
        n += 1
    return out


def bioc_xml_to_spans(xml_text: str) -> List[dict]:
    """ALL passages of a BioC document as span dicts (kind, text,
    media_ref, offset) in document order.

    kind: ``ref``/``title`` for the reference's dropped section types
    (admission flag downstream excludes them, pub.py:51-52), ``text``
    otherwise.  offset: the BioC ``<offset>`` byte offset when present,
    else -1.  media_ref: always "" (BioC carries no media payloads).
    """
    root = ET.fromstring(xml_text)
    spans: List[dict] = []
    for passage in root.iter("passage"):
        section_type = (
            passage.findtext('infon[@key="section_type"]', "") or ""
        ).lower()
        text_elem = passage.find("text")
        text = (
            text_elem.text.strip()
            if text_elem is not None and text_elem.text
            else ""
        )
        off_txt = passage.findtext("offset")
        try:
            offset = int(off_txt) if off_txt is not None else -1
        except ValueError:
            offset = -1
        kind = section_type if section_type in _DROP_SECTIONS else "text"
        spans.append(
            {"kind": kind, "text": text, "media_ref": "", "offset": offset}
        )
    return spans


_SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)


class BiocReader:
    """map_batches stage: (doc_id, xml) rows → DOCUMENTS rows (doc_id,
    spans).  XML parsing state is trivial, but the class form keeps the
    stage an actor pool so a future lxml/libxml2 swap-in pays its import
    once per actor."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        xmls = batch.column("xml").to_pylist()
        spans = [bioc_xml_to_spans(x or "") for x in xmls]
        return pa.table(
            {
                "doc_id": pa.array([str(i) for i in ids], pa.string()),
                "spans": pa.array(spans, pa.list_(_SPAN_TYPE)),
            }
        )


def read_bioc_documents(xml_ds: "object") -> "object":
    """Dataset of (doc_id, xml) → DOCUMENTS dataset (doc_id, spans)."""
    return xml_ds.map_batches(
        BiocReader, batch_format="pyarrow", concurrency=(1, 8)
    )
