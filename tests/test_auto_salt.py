"""Auto-salting trigger for node canonicalization (r2 verdict item 6):
on a planted hot-key corpus the measured top-key share must engage the
salted two-phase aggregate, and the salted plan's output must be
byte-identical to the unsalted plan (same oracle as kg_nodes)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from kgray.stages.nodes import (
    canonicalize_nodes,
    edge_node_mentions,
    measure_top_key_share,
    unary_node_mentions,
)


def _planted_edges(n_docs: int = 400, hot: str = "p(HGNC:TP53)"):
    """Every doc mentions the hot entity; cold entities are unique per
    doc — the hot key's mention share is ~50% of edge-side rows."""
    rows = {
        "doc_id": [], "span_seq": [], "stmt_seq": [], "subj": [], "obj": [],
    }
    for d in range(n_docs):
        rows["doc_id"].append(f"doc{d:05d}")
        rows["span_seq"].append(0)
        rows["stmt_seq"].append(0)
        rows["subj"].append(hot)
        rows["obj"].append(f"p(HGNC:GENE{d})")
    return pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.string()),
            "span_seq": pa.array(rows["span_seq"], pa.int64()),
            "stmt_seq": pa.array(rows["stmt_seq"], pa.int64()),
            "subj": pa.array(rows["subj"], pa.string()),
            "obj": pa.array(rows["obj"], pa.string()),
        }
    )


def _empty_unary():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "span_seq": pa.array([], pa.int64()),
                "stmt_seq": pa.array([], pa.int64()),
                "name": pa.array([], pa.string()),
            }
        )
    )


def _empty_url_agg():
    # canonicalize_nodes takes the URL aggregate as a DATASET now (the
    # collected-dict API was removed with the r3 build_url_map fix)
    return ray.data.from_arrow(
        pa.table(
            {
                "entry_name": pa.array([], pa.string()),
                "url": pa.array([], pa.string()),
            }
        )
    )


def test_top_key_share_measures_planted_skew(ray_session):
    edges = ray.data.from_arrow(_planted_edges()).repartition(16)
    mentions = edges.map_batches(
        edge_node_mentions, batch_format="pyarrow"
    ).materialize()
    share, total = measure_top_key_share(mentions)
    # hot name appears once per block post-combiner; cold names once
    # total.  16 blocks, 400 cold names → share ≈ 16/416
    assert total > 400
    assert share > 0.02
    # and a uniform corpus reads as non-skewed
    uniq = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(200)], pa.string()),
            "span_seq": pa.array([0] * 200, pa.int64()),
            "stmt_seq": pa.array([0] * 200, pa.int64()),
            "subj": pa.array([f"p(HGNC:A{i})" for i in range(200)]),
            "obj": pa.array([f"p(HGNC:B{i})" for i in range(200)]),
        }
    )
    m2 = (
        ray.data.from_arrow(uniq)
        .repartition(8)
        .map_batches(edge_node_mentions, batch_format="pyarrow")
        .materialize()
    )
    share2, _ = measure_top_key_share(m2)
    assert share2 < 0.01


def test_salted_plan_engages_and_matches_unsalted(ray_session):
    edges = ray.data.from_arrow(_planted_edges()).repartition(16)
    url_ref = _empty_url_agg()

    # auto mode with thresholds scaled to the test corpus: must salt
    auto = canonicalize_nodes(
        edges, _empty_unary(), url_ref,
        salt_buckets=None, salt_min_rows=100, salt_share_threshold=0.02,
    ).to_pandas().sort_values("node_id").reset_index(drop=True)

    unsalted = canonicalize_nodes(
        edges, _empty_unary(), url_ref, salt_buckets=1
    ).to_pandas().sort_values("node_id").reset_index(drop=True)

    forced = canonicalize_nodes(
        edges, _empty_unary(), url_ref, salt_buckets=16
    ).to_pandas().sort_values("node_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(auto, unsalted)
    pd.testing.assert_frame_equal(forced, unsalted)
    # dense first-seen ids: hot subj of doc00000 is node 0
    assert unsalted.name.iloc[0] == "p(HGNC:TP53)"
    assert list(unsalted.node_id) == list(range(len(unsalted)))


def test_auto_salt_decision_boundary(ray_session, monkeypatch):
    """The decision itself: planted skew → buckets > 1; uniform → 1.
    Captured by monkeypatching the salting branch's entry."""
    import kgray.stages.nodes as nodes_mod

    chosen = {}
    orig = nodes_mod.measure_top_key_share

    def spy(mentions, num_partitions=8):
        share, total = orig(mentions, num_partitions)
        chosen["share"] = share
        return share, total

    monkeypatch.setattr(nodes_mod, "measure_top_key_share", spy)
    edges = ray.data.from_arrow(_planted_edges()).repartition(16)
    canonicalize_nodes(
        edges, _empty_unary(), _empty_url_agg(),
        salt_buckets=None, salt_min_rows=100, salt_share_threshold=0.02,
    ).materialize()
    assert chosen["share"] > 0.02
