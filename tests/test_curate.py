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


def test_pretrain_corpus_matches_pandas_reference():
    """Full-chain reference: Gopher admission → decontamination → exact
    dedup → exact-Jaccard near-dup components → keep reps."""
    import numpy as np
    import pandas as pd

    from kgray.pipelines.curate import pretrain_corpus

    SF = "/root/testdata/sf0.001"
    out = pretrain_corpus(SF).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet")

    def shingles(text):
        toks = text.split(" ")
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    # 1. admission
    adm = []
    for _, r in docs.iterrows():
        toks = r.text.split(" ")
        n = len(toks)
        nd = len(set(toks))
        ch = sum(len(t) for t in toks)
        hits = sum(1 for t in toks if t in ("the", "a"))
        if (
            r.lang == "en" and 15 <= n <= 90
            and 3.0 <= ch / n <= 4.5 and nd / n >= 0.35 and hits >= 1
        ):
            adm.append((r.doc_id, r.text, n))
    adm = pd.DataFrame(adm, columns=["doc_id", "text", "n"])

    # 2. decontamination (bench = raw-corpus docs with id % 97 == 0)
    bench = set()
    for _, r in docs[docs.doc_id % 97 == 0].iterrows():
        bench |= shingles(r.text)
    keep = []
    for _, r in adm.iterrows():
        if r.doc_id % 97 == 0:
            continue
        if shingles(r.text) & bench:
            continue
        keep.append(r)
    clean = pd.DataFrame(keep, columns=adm.columns)

    # 3. exact dedup
    ded = clean.sort_values("doc_id").drop_duplicates("text", keep="first")

    # 4. exact near-dup components at J >= 0.5
    sh = {r.doc_id: shingles(r.text) for _, r in ded.iterrows()}
    parent = {d: d for d in sh}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= 0.5:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    reps = {d for d in ids if find(d) == d}

    exp = ded[ded.doc_id.isin(reps)]
    assert set(out.doc_id) == set(exp.doc_id)
    got_n = out.set_index("doc_id").n_tokens
    exp_n = exp.set_index("doc_id").n
    assert got_n.sort_index().to_dict() == exp_n.sort_index().to_dict()
    # the chain is non-degenerate on this corpus: something survives AND
    # something is filtered at every scale
    assert 0 < len(out) < len(docs)
