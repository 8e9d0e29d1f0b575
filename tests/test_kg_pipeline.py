"""End-to-end parity of the KG pipeline on the synthetic corpus.

The P/R ≥ 0.95 gate (BASELINE.json): emitted (subj, pred, obj) triples per
document vs the gold set known by construction, plus first-seen node
canonicalization semantics (convert_to_cx2.py:74-166) and the span-sequence
invariant across the whole pipeline.
"""
import pyarrow as pa
import pytest
import ray.data

from kgray.corpus import generate_documents
from kgray.eval.compare import triple_prf
from kgray.pipelines.kg import KGConfig, run_kg_pipeline
from kgray.stages.chunk import check_span_invariant, reassemble_documents


@pytest.fixture(scope="module")
def pipeline_result():
    docs, gold_edges, gold_unary = generate_documents(60, seed=42)
    ds = ray.data.from_arrow(docs).repartition(8)
    res = run_kg_pipeline(ds, KGConfig(annotate_concurrency=(1, 2),
                                       extract_concurrency=(1, 2)))
    return docs, gold_edges, gold_unary, res


def test_triples_match_gold(pipeline_result):
    _, gold_edges, _, res = pipeline_result
    edges = res.edges.to_pandas()
    got = set(zip(edges.doc_id, edges.span_seq, edges.subj, edges.pred,
                  edges.obj))
    want = set(
        zip(
            *[
                gold_edges.column(c).to_pylist()
                for c in ["doc_id", "span_seq", "subj", "pred", "obj"]
            ]
        )
    )
    p, r, f1 = triple_prf(got, want)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_evidence_matches_gold(pipeline_result):
    _, gold_edges, _, res = pipeline_result
    edges = res.edges.to_pandas()
    got = set(zip(edges.doc_id, edges.subj, edges.obj, edges.evidence))
    want = set(
        zip(
            *[
                gold_edges.column(c).to_pylist()
                for c in ["doc_id", "subj", "obj", "evidence"]
            ]
        )
    )
    assert got == want


def test_unary_statements_become_nodes_not_edges(pipeline_result):
    _, _, gold_unary, res = pipeline_result
    unary = res.unary_nodes.to_pandas()
    got = set(zip(unary.doc_id, unary.span_seq, unary.name))
    want = set(
        zip(
            *[
                gold_unary.column(c).to_pylist()
                for c in ["doc_id", "span_seq", "name"]
            ]
        )
    )
    assert got == want
    # no unary term leaks into the edge list as a subject of a fake edge
    edges = res.edges.to_pandas()
    assert not edges.pred.isna().any()


def test_node_canonicalization(pipeline_result):
    _, _, _, res = pipeline_result
    nodes = res.nodes.to_pandas()
    edges = res.edges.to_pandas()
    # dense ids 0..n-1, unique names
    assert sorted(nodes.node_id) == list(range(len(nodes)))
    assert nodes.name.is_unique
    # every edge endpoint and unary term is a node (and nothing else)
    endpoints = set(edges.subj) | set(edges.obj) | set(
        res.unary_nodes.to_pandas().name
    )
    assert set(nodes.name) == endpoints
    # url resolution: name-or-label probe (convert_to_cx2.py:159)
    urls = res.url_map
    for _, row in nodes.iterrows():
        expect = urls.get(row["name"], urls.get(row["label"]))
        assert row["url"] == expect


def test_first_seen_node_order(pipeline_result):
    """node_id order == lexicographic (doc_id, span_seq, stmt_seq, side)."""
    _, _, _, res = pipeline_result
    edges = res.edges.to_pandas()
    unary = res.unary_nodes.to_pandas()
    mentions = []
    for _, e in edges.iterrows():
        mentions.append(((e.doc_id, e.span_seq, e.stmt_seq, 0), e.subj))
        mentions.append(((e.doc_id, e.span_seq, e.stmt_seq, 1), e.obj))
    for _, u in unary.iterrows():
        mentions.append(((u.doc_id, u.span_seq, u.stmt_seq, 0), u["name"]))
    mentions.sort(key=lambda kv: kv[0])
    expected_order = []
    seen = set()
    for _, name in mentions:
        if name not in seen:
            seen.add(name)
            expected_order.append(name)
    nodes = res.nodes.to_pandas().sort_values("node_id")
    assert list(nodes.name) == expected_order


def test_salted_canonicalization_identical(pipeline_result):
    """The salted two-phase aggregate yields exactly the same node table."""
    from kgray.stages.nodes import node_tables

    _, _, _, res = pipeline_result
    salted, _ = node_tables(
        res.edges, res.unary_nodes, res.annotation_urls, salt_buckets=7
    )
    a = res.nodes.to_pandas().sort_values("name").reset_index(drop=True)
    b = salted.to_pandas().sort_values("name").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_span_invariant_through_pipeline(pipeline_result):
    docs, _, _, res = pipeline_result
    chunk_cols = ["doc_id", "span_seq", "kind", "text", "media_ref", "offset"]
    ext = res.extractions.to_pandas()[chunk_cols]
    rebuilt = reassemble_documents(pa.Table.from_pandas(ext, preserve_index=False))
    check_span_invariant(docs, rebuilt)


def test_media_spans_pass_through_untouched(pipeline_result):
    docs, _, _, res = pipeline_result
    ext = res.extractions.to_pandas()
    media = ext[ext.kind == "media"]
    assert len(media) > 0
    assert (media.text == "").all()
    assert media.media_ref.str.startswith("synthetic://").all()
    assert media.results.map(len).sum() == 0  # never extracted from


def test_pipeline_is_deterministic_across_runs():
    """Two independent executions over the same corpus produce
    byte-identical edge and node tables (sorted) — the reproducibility
    contract checkpoint resume and incremental merge both build on."""
    import pandas as pd
    import ray.data

    from kgray.corpus import generate_documents
    from kgray.pipelines.kg import run_kg_pipeline

    docs, _, _ = generate_documents(30, seed=21)

    def run_once():
        res = run_kg_pipeline(ray.data.from_arrow(docs).repartition(6))
        e = res.edges.to_pandas().sort_values(
            ["doc_id", "span_seq", "stmt_seq"]
        ).reset_index(drop=True)
        n = res.nodes.to_pandas().sort_values("node_id").reset_index(
            drop=True
        )
        return e, n

    e1, n1 = run_once()
    e2, n2 = run_once()
    pd.testing.assert_frame_equal(e1, e2)
    pd.testing.assert_frame_equal(n1, n2)


def test_zero_document_corpus_yields_empty_graph():
    """The flagship on an empty corpus: 0 edges, 0 nodes, no crash —
    every stage must tolerate empty blocks end to end."""
    from kgray.corpus import generate_documents
    from kgray.pipelines.kg import run_kg_pipeline

    docs, _, _ = generate_documents(3, seed=42)
    res = run_kg_pipeline(ray.data.from_arrow(docs.slice(0, 0)))
    assert res.edges.count() == 0
    assert res.nodes.count() == 0


def test_url_map_guard(pipeline_result):
    """The export-only url_map collection is bounded: past
    URL_MAP_MAX_ROWS it refuses to collect (r4 verdict: no unbounded
    take_all reachable from a production result object)."""
    import dataclasses

    import pytest

    _, _, _, res = pipeline_result
    guarded = dataclasses.replace(res)
    object.__setattr__(guarded, "URL_MAP_MAX_ROWS", 0)
    with pytest.raises(ValueError, match="url_map would collect"):
        guarded.url_map
