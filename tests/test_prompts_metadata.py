"""Prompt-block loader, metadata/naming, id validation, id-map lookup."""
import os

import pyarrow as pa
import pytest
import ray.data

from kgray.functions import prompts
from kgray.functions.prompts import extract_block, load_prompt
from kgray.sources.metadata import (
    map_ids,
    name_graphs,
    network_name,
    split_valid_documents,
    synth_metadata,
)


def test_prompt_block_extraction():
    content = (
        "# general prompt\nline one\nline two\n"
        "# other block\nother text\n"
    )
    # reference joins captured lines WITHOUT newlines (get_interactions.py:29)
    assert extract_block(content, "general prompt") == "line oneline two"
    assert extract_block(content, "other block") == "other text"
    assert extract_block(content, "missing") == ""
    # BOM stripped
    assert extract_block("﻿# x\nbody\n", "x") == "body"
    # builtin prompts load
    assert "interactions" in load_prompt()
    assert load_prompt(identifier="minimal prompt")


def test_validate_and_quarantine():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["PMC123", "pmc999", "PMCX", "PMC4567"],
                "spans": [[], [], [], []],
            }
        )
    )
    valid, quarantined = split_valid_documents(docs)
    assert sorted(r["doc_id"] for r in valid.take_all()) == [
        "PMC123", "PMC4567",
    ]
    q = quarantined.to_pandas()
    assert sorted(q.doc_id) == ["PMCX", "pmc999"]
    assert (q.reason == "invalid doc_id format").all()


def test_metadata_and_naming():
    t = pa.table({"doc_id": ["PMC1", "PMC2"]})
    meta = synth_metadata(t)
    meta2 = synth_metadata(t)
    assert meta.equals(meta2)  # deterministic
    assert meta.column("pmid").to_pylist()[0].isdigit()
    assert network_name("Smith", "123") == "Smith et al.: 123"
    assert network_name(None, None, "My Net") == "My Net"
    assert network_name(None, None) == "00000000_0000"
    graphs = ray.data.from_arrow(
        pa.table({"doc_id": ["PMC1"], "n_edges": pa.array([5], pa.int64())})
    )
    named = name_graphs(graphs).to_pandas()
    assert named.network_name.iloc[0].endswith(named.pmid.iloc[0])
    assert " et al.: " in named.network_name.iloc[0]


def test_map_ids():
    ds = ray.data.from_arrow(
        pa.table({"pmid": ["1", "2", "3"]})
    )
    out = map_ids(ds, {"1": "PMC10", "3": "PMC30"}, "pmid", "pmcid")
    df = out.to_pandas().sort_values("pmid")
    assert df.pmcid.tolist() == ["PMC10", None, "PMC30"]


# --- golden parity of extract_block vs the reference's scan loop over the
# reference's OWN prompt files (get_interactions.py:9-29), all 9 variants ---

_REF_DATA = "/root/reference/data"
_REF_PROMPT_FILES = [
    "minimal_prompt_1.txt", "minimal_prompt_2.txt", "prompt_file.txt",
    "prompt_file_v2.txt", "prompt_file_v3.txt", "prompt_file_v4.txt",
    "prompt_file_v5.txt", "prompt_file_v6.txt", "prompt_file_v7.txt",
]


def _reference_scan(content: str, identifier: str) -> str:
    """Independent transcription of the reference capture loop
    (get_interactions.py:12-29) used ONLY as the golden in this test."""
    if content.startswith("﻿"):
        content = content.lstrip("﻿")
    prompt, capture = [], False
    for line in content.splitlines():
        if line.strip().startswith("#") and identifier in line:
            capture = True
            continue
        if capture:
            if line.strip().startswith("#") and len(prompt) > 0:
                break
            prompt.append(line)
    return "".join(prompt)


def _identifiers_in(content: str):
    ids = []
    for line in content.splitlines():
        s = line.strip()
        if s.startswith("#") and len(s) > 1:
            ids.append(s.lstrip("#").strip())
    return [i for i in ids if i]


@pytest.mark.parametrize("fname", _REF_PROMPT_FILES)
def test_extract_block_golden_vs_reference_files(fname):
    path = os.path.join(_REF_DATA, fname)
    if not os.path.exists(path):
        pytest.skip("reference prompt files not present")
    with open(path, encoding="utf-8") as f:
        content = f.read()
    idents = _identifiers_in(content) or ["general prompt"]
    for ident in idents + ["general prompt"]:
        got = prompts.extract_block(content, ident)
        want = _reference_scan(content, ident)
        assert got == want, (fname, ident)
    # v7's general prompt must be non-trivial (the production prompt)
    if fname == "prompt_file_v7.txt":
        assert len(prompts.extract_block(content, "general prompt")) > 1000


def test_resolve_default_prompt_env(tmp_path, monkeypatch):
    p = tmp_path / "p.txt"
    p.write_text("# general prompt\nCUSTOM BLOCK\n# other\nx\n")
    monkeypatch.setenv("KGRAY_PROMPT_FILE", str(p))
    assert prompts.resolve_default_prompt() == "CUSTOM BLOCK"
    monkeypatch.delenv("KGRAY_PROMPT_FILE")
    # without env + without the reference package installed: builtin block
    out = prompts.resolve_default_prompt()
    assert "BEL" in out


# --- E-utilities metadata XML parsing, both dialects (pub.py:69-211) ---

PUBMED_XML = """<?xml version="1.0"?>
<PubmedArticleSet>
 <PubmedArticle>
  <MedlineCitation>
   <PMID Version="1">28154610</PMID>
   <Article>
    <Journal><Title>The Open Pain Journal</Title></Journal>
    <ArticleTitle>The Complement System in Neuropathic Pain</ArticleTitle>
    <Abstract>
     <AbstractText Label="BACKGROUND">Certain types of pain are unmet needs.</AbstractText>
     <AbstractText Label="RESULTS">Complement inhibition reduces pain.</AbstractText>
    </Abstract>
    <AuthorList>
     <Author><LastName>Fritzinger</LastName><ForeName>David C.</ForeName></Author>
     <Author><LastName>Benjamin</LastName><ForeName>Daniel E.</ForeName></Author>
     <Author><CollectiveName>Some Consortium</CollectiveName></Author>
    </AuthorList>
   </Article>
  </MedlineCitation>
  <PubmedData>
   <ArticleIdList>
    <ArticleId IdType="pubmed">28154610</ArticleId>
    <ArticleId IdType="doi">10.2174/1876386301609010026</ArticleId>
   </ArticleIdList>
  </PubmedData>
 </PubmedArticle>
</PubmedArticleSet>
"""

PMC_XML = """<?xml version="1.0"?>
<pmc-articleset>
 <article>
  <front>
   <journal-meta><journal-title-group><journal-title>Cell Signals</journal-title></journal-title-group></journal-meta>
   <article-meta>
    <article-id pub-id-type="pmid">12345678</article-id>
    <article-id pub-id-type="doi">10.1000/xyz123</article-id>
    <title-group><article-title>A JATS-dialect title</article-title></title-group>
    <contrib-group>
     <contrib contrib-type="author"><name><surname>Chen</surname><given-names>Li</given-names></name></contrib>
     <contrib contrib-type="editor"><name><surname>NotAnAuthor</surname><given-names>X</given-names></name></contrib>
    </contrib-group>
    <abstract><p>First abstract paragraph.</p><p>Second one.</p></abstract>
   </article-meta>
  </front>
 </article>
</pmc-articleset>
"""


def test_parse_pubmed_dialect():
    from kgray.sources.metadata import parse_eutils_metadata

    md = parse_eutils_metadata("28154610", PUBMED_XML)
    assert md["pmid"] == "pmid28154610"
    assert md["title"] == "The Complement System in Neuropathic Pain"
    assert md["authors"] == ["David C. Fritzinger", "Daniel E. Benjamin"]
    assert md["abstract"] == (
        "Certain types of pain are unmet needs. "
        "Complement inhibition reduces pain."
    )
    assert md["doi"] == "10.2174/1876386301609010026"
    assert md["journal"] == "The Open Pain Journal"


def test_parse_pmc_dialect():
    from kgray.sources.metadata import parse_eutils_metadata

    md = parse_eutils_metadata("PMC999", PMC_XML)
    assert md["pmid"] == "pmid12345678"
    assert md["doi"] == "10.1000/xyz123"
    assert md["title"] == "A JATS-dialect title"
    assert md["authors"] == ["Li Chen"]  # editors excluded, pub.py:189
    assert md["abstract"] == "First abstract paragraph. Second one."
    assert md["journal"] == "Cell Signals"


def test_parse_metadata_missing_fields_and_stage():
    from kgray.sources.metadata import (
        EutilsMetadataParser,
        parse_eutils_metadata,
    )

    md = parse_eutils_metadata("PMC1", "<pmc-articleset/>")
    assert md == {"pmid": None, "title": None, "authors": [],
                  "abstract": None, "doi": None, "journal": None}
    out = EutilsMetadataParser()(
        pa.table({"doc_id": ["28154610", "PMC999"],
                  "xml": [PUBMED_XML, PMC_XML]})
    )
    assert out.column("journal").to_pylist() == [
        "The Open Pain Journal", "Cell Signals"
    ]
    assert out.column("authors").to_pylist()[1] == ["Li Chen"]
