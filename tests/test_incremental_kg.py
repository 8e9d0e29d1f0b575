"""Tests for smart_join (adaptive broadcast/shuffle), media content
dedup, and the id-stable incremental KG update."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


# ---------------------------------------------------------------------------
# smart_join
# ---------------------------------------------------------------------------

def _sides():
    left = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 2, 2, 3, 5], "lv": [10, 20, 21, 30, 50]})
    )
    right = ray.data.from_pandas(
        pd.DataFrame({"rk": [2, 3, 4], "rv": ["b", "c", "d"]})
    )
    lt = {"k": pa.int64(), "lv": pa.int64()}
    rt = {"rk": pa.int64(), "rv": pa.string()}
    return left, right, lt, rt


def test_smart_join_broadcast_equals_shuffle_all_hows():
    from kgray.utils import repartition_join, smart_join

    for how in ("inner", "left", "semi", "anti"):
        left, right, lt, rt = _sides()
        bc = smart_join(left, right, "k", "rk", lt, rt, how=how,
                        broadcast_threshold=1000).to_pandas()
        left, right, lt, rt = _sides()
        sh = smart_join(left, right, "k", "rk", lt, rt, how=how,
                        broadcast_threshold=0).to_pandas()
        left, right, lt, rt = _sides()
        rp = repartition_join(left, right, "k", "rk", lt, rt,
                              how=how).to_pandas()
        key = sorted(bc.columns)
        for df in (bc, sh, rp):
            df.sort_values(key, inplace=True)
            df.reset_index(drop=True, inplace=True)
        assert bc[key].astype(str).equals(sh[key].astype(str)), how
        assert bc[key].astype(str).equals(rp[key].astype(str)), how


def test_smart_join_inner_values():
    from kgray.utils import smart_join

    left, right, lt, rt = _sides()
    out = smart_join(left, right, "k", "rk", lt, rt).to_pandas()
    got = sorted(zip(out.k, out.lv, out.rv))
    assert got == [(2, 20, "b"), (2, 21, "b"), (3, 30, "c")]


# ---------------------------------------------------------------------------
# media content dedup
# ---------------------------------------------------------------------------

def test_media_dedup_by_payload_content():
    from kgray.stages.multimodal import media_content_key, media_dedup

    rows = pd.DataFrame(
        {
            "doc_id": ["d1", "d1", "d2", "d2", "d3"],
            "span_seq": [0, 1, 0, 1, 0],
            "kind": ["media", "media", "media", "text", "media"],
            "media_ref": ["m://a", "m://b", "m://a2", "", "m://c"],
            "payload": [b"XX", b"YY", b"XX", None, b"ZZ"],
        }
    )
    chunks = ray.data.from_arrow(pa.Table.from_pandas(rows))
    out = media_dedup(chunks).to_pandas()
    # payload XX appears twice under different refs → one survivor
    # (text spans never participate)
    assert len(out) == 3
    xx_key = int(media_content_key(["m://a"], [b"XX"])[0])
    xx = out[out.content_key == xx_key]
    assert xx.n_copies.iloc[0] == 2
    assert xx.doc_id.iloc[0] == "d1" and xx.span_seq.iloc[0] == 0
    assert set(out.n_copies) == {1, 2}


def test_media_content_key_empty_payload_is_content():
    """b'' is present content: two EMPTY payloads share a key regardless
    of ref, and differ from a MISSING payload's ref-keyed fallback."""
    from kgray.stages.multimodal import media_content_key

    keys = media_content_key(
        ["m://a", "m://b", "m://a"], [b"", b"", None]
    )
    assert keys[0] == keys[1]
    assert keys[0] != keys[2]


def test_media_dedup_falls_back_to_ref_without_payload():
    from kgray.stages.multimodal import media_dedup

    rows = pd.DataFrame(
        {
            "doc_id": ["a", "b"],
            "span_seq": [0, 0],
            "kind": ["media", "media"],
            "media_ref": ["m://same", "m://same"],
        }
    )
    chunks = ray.data.from_arrow(pa.Table.from_pandas(rows))
    out = media_dedup(chunks).to_pandas()
    assert len(out) == 1
    assert out.n_copies.iloc[0] == 2
    assert out.doc_id.iloc[0] == "a"


# ---------------------------------------------------------------------------
# incremental KG update
# ---------------------------------------------------------------------------

def test_incremental_update_id_stability_and_name_completeness():
    from kgray.corpus import generate_documents
    from kgray.pipelines.kg import incremental_update, run_kg_pipeline

    docs, _, _ = generate_documents(40, seed=11)
    full_ds = ray.data.from_arrow(docs)
    n = docs.num_rows
    half = n // 2
    a_ds = ray.data.from_arrow(docs.slice(0, half))
    b_ds = ray.data.from_arrow(docs.slice(half))

    full = run_kg_pipeline(full_ds)
    base = run_kg_pipeline(a_ds)
    base_nodes = base.nodes.to_pandas()

    merged = incremental_update(base.nodes, b_ds)
    mn = merged.nodes.to_pandas()

    # 1. every existing node keeps its id verbatim
    old = mn.set_index("name").node_id
    for _, r in base_nodes.iterrows():
        assert old[r["name"]] == r.node_id

    # 2. the merged name set equals the full-corpus name set
    assert set(mn.name) == set(full.nodes.to_pandas().name)

    # 3. ids are dense and unique: 0..N-1
    ids = sorted(mn.node_id)
    assert ids == list(range(len(mn)))

    # 4. new shard's edges equal the full pipeline's edges on those docs
    full_edges = full.edges.to_pandas()
    b_ids = set(b_ds.to_pandas().doc_id)
    exp = full_edges[full_edges.doc_id.isin(b_ids)]
    got = merged.edges.to_pandas()
    key = ["doc_id", "span_seq", "subj", "pred", "obj"]
    assert sorted(map(tuple, got[key].values.tolist())) == sorted(
        map(tuple, exp[key].values.tolist())
    )


def test_incremental_update_from_empty_graph():
    from kgray.corpus import generate_documents
    from kgray.pipelines.kg import incremental_update, run_kg_pipeline

    docs, _, _ = generate_documents(10, seed=3)
    ds = ray.data.from_arrow(docs)
    empty_nodes = ray.data.from_arrow(
        pa.table(
            {
                "name": pa.array([], pa.string()),
                "label": pa.array([], pa.string()),
                "type": pa.array([], pa.string()),
                "url": pa.array([], pa.string()),
                "node_id": pa.array([], pa.int64()),
            }
        )
    )
    merged = incremental_update(empty_nodes, ds)
    direct = run_kg_pipeline(ds)
    got = merged.nodes.to_pandas().sort_values("node_id")
    exp = direct.nodes.to_pandas().sort_values("node_id")
    assert got.name.tolist() == exp.name.tolist()
    assert got.node_id.tolist() == exp.node_id.tolist()
