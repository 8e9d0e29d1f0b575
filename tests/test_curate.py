"""Composite corpus-curation pipeline (pipelines/curate.py): every stage's
filter must act on the PREVIOUS stage's survivors."""
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from kgray.pipelines.curate import curate_corpus


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture()
def corpus_dir(tmp_path):
    base = _words("w", 30)
    near = base.split()
    near[10] = "CHANGED"  # 1-word edit: 3-gram Jaccard ≈ 0.81 ≥ 0.5
    rows = [
        (1, base, "en"),                 # survivor (component rep)
        (2, base, "en"),                 # exact duplicate of 1 → dropped
        (3, " ".join(near), "en"),       # near-duplicate of 1 → dropped
        (4, _words("f", 30), "fr"),      # wrong language → dropped
        (5, _words("s", 10), "en"),      # too short → dropped
        (6, _words("l", 120), "en"),     # too long → dropped
        (7, _words("x", 40), "en"),      # survivor (distinct)
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_curate_survivors(ray_session, corpus_dir):
    out = curate_corpus(corpus_dir).to_pandas().sort_values("doc_id")
    assert list(out.doc_id) == [1, 7]
    assert list(out.n_tokens) == [30, 40]


def test_curate_near_dup_respects_admission(ray_session, tmp_path):
    """A near-duplicate of an INADMISSIBLE doc must survive: the LSH graph
    is built over admitted+deduped survivors only."""
    base = _words("w", 120)              # too long → never admitted
    near = base.split()[:90]             # admissible 90-token prefix
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([base, " ".join(near)], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    out = curate_corpus(str(tmp_path)).to_pandas()
    assert list(out.doc_id) == [2]


def test_curate_exact_matches_lsh(ray_session, corpus_dir):
    """Both pair methods agree on this corpus (LSH recall ~1 here)."""
    a = curate_corpus(corpus_dir, pair_method="lsh").to_pandas()
    b = curate_corpus(corpus_dir, pair_method="exact").to_pandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)


def test_train_val_split_stable_and_sized(ray_session, tmp_path):
    """Split is deterministic, stable under corpus growth, and near the
    requested fraction."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgray.pipelines.curate import train_val_split

    def write(n, d):
        t = pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        })
        pq.write_table(t, os.path.join(d, "documents.parquet"))

    small, big = tmp_path / "s", tmp_path / "b"
    small.mkdir(); big.mkdir()
    write(2000, str(small))
    write(6000, str(big))
    s = train_val_split(str(small), 0.2).to_pandas().set_index("doc_id")
    b = train_val_split(str(big), 0.2).to_pandas().set_index("doc_id")
    # growth never flips an existing assignment
    assert (s.split == b.loc[s.index].split).all()
    frac = (b.split == "val").mean()
    assert abs(frac - 0.2) < 0.02
