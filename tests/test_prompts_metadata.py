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
