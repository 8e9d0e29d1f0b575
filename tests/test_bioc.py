"""BioC/PubTator XML source: golden parity against the reference's own
published artifacts (results/<id>/pmc<id>.xml vs <id>_pub_paragraphs.json),
plus the Ray-side plumbing through explode_spans."""
import json
import os

import pyarrow as pa
import pytest
import ray.data

from kgray.sources.bioc import (
    BiocReader,
    bioc_xml_to_spans,
    parse_pubtator_paragraphs,
    read_bioc_documents,
)
from kgray.stages.chunk import explode_spans

REF = "/root/reference/results"

GOLDEN_DOCS = [
    ("PMC5283843", "pmcPMC5283843.xml", "PMC5283843_pub_paragraphs.json"),
    ("PMC3898398", "pmcPMC3898398.xml", "pmc3898398_pub_paragraphs.json"),
]


def _load(doc, xml_name, json_name):
    xml_path = os.path.join(REF, doc, xml_name)
    json_path = os.path.join(REF, doc, json_name)
    if not (os.path.exists(xml_path) and os.path.exists(json_path)):
        pytest.skip(f"reference fixtures for {doc} not present")
    with open(xml_path) as f:
        xml = f.read()
    with open(json_path) as f:
        want = json.load(f)
    return xml, want


@pytest.mark.parametrize("doc,xml_name,json_name", GOLDEN_DOCS)
def test_pubtator_paragraphs_golden(doc, xml_name, json_name):
    xml, want = _load(doc, xml_name, json_name)
    got = parse_pubtator_paragraphs(xml)
    assert len(got) == len(want)
    for k, v in want.items():
        assert got[k]["text"] == v["text"], (doc, k)


@pytest.mark.parametrize("doc,xml_name,json_name", GOLDEN_DOCS)
def test_bioc_spans_admission_matches_reference(doc, xml_name, json_name):
    """ALL passages become spans; the explode_spans admission flag must
    select exactly the reference's admitted paragraphs, in order."""
    xml, want = _load(doc, xml_name, json_name)
    docs = read_bioc_documents(
        ray.data.from_arrow(
            pa.table({"doc_id": [doc], "xml": [xml]})
        )
    )
    chunks = docs.map_batches(explode_spans, batch_format="pyarrow").to_pandas()
    admitted = chunks[chunks.admitted].sort_values("span_seq")
    want_texts = [want[str(i)]["text"] for i in range(len(want))]
    # NOTE: explode_spans admits every non-ref/title span of length >= 20;
    # the stripped passage text is what the reference numbers.
    assert list(admitted.text) == want_texts
    # every dropped passage is still present as a row (span-sequence
    # invariant holds over ALL passages)
    n_passages = len(bioc_xml_to_spans(xml))
    assert len(chunks) == n_passages
    assert list(chunks.sort_values("span_seq").span_seq) == list(
        range(n_passages)
    )


def test_bioc_reader_batch_shapes():
    xml = (
        "<collection><document><id>1</id>"
        '<passage><infon key="section_type">TITLE</infon><offset>0</offset>'
        "<text>A title passage that is long enough</text></passage>"
        '<passage><infon key="section_type">INTRO</infon><offset>40</offset>'
        "<text>An intro paragraph long enough to be admitted.</text>"
        "</passage>"
        '<passage><infon key="section_type">REF</infon><offset>90</offset>'
        "<text>Some reference entry</text></passage>"
        "<passage><offset>120</offset><text>short</text></passage>"
        "</document></collection>"
    )
    out = BiocReader()(
        pa.table({"doc_id": ["PMC1"], "xml": [xml]})
    )
    spans = out.column("spans").to_pylist()[0]
    assert [s["kind"] for s in spans] == ["title", "text", "ref", "text"]
    assert [s["offset"] for s in spans] == [0, 40, 90, 120]
    paras = parse_pubtator_paragraphs(xml)
    assert [p["text"] for p in paras.values()] == [
        "An intro paragraph long enough to be admitted."
    ]
