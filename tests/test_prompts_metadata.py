"""Prompt-block loader, metadata/naming, id validation, id-map lookup."""
import pyarrow as pa
import ray.data

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
