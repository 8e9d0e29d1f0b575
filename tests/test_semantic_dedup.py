"""Semantics tests for k-means over embeddings and SemDeDup-style
semantic deduplication (stages/similarity additions).

Both are iterative/approximate (no SQL oracle); these tests pin them
hard instead: the k-means loop must match a numpy replica of the exact
same algorithm step for step, and semantic_dedup at k=1 must equal
brute-force cosine components (the approximation vanishes with one
cluster, leaving only the mechanism to verify).
"""
import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

SF = "/root/testdata/sf0.001"


def _numpy_kmeans(vecs: np.ndarray, k: int, iters: int):
    C = vecs[:k].astype(np.float64).copy()
    for _ in range(iters):
        d2 = (
            (vecs * vecs).sum(axis=1, keepdims=True)
            - 2.0 * (vecs @ C.T)
            + (C * C).sum(axis=1)
        )
        a = d2.argmin(axis=1)
        for c in range(k):
            sel = a == c
            if sel.any():
                C[c] = vecs[sel].mean(axis=0)
    d2 = (
        (vecs * vecs).sum(axis=1, keepdims=True)
        - 2.0 * (vecs @ C.T)
        + (C * C).sum(axis=1)
    )
    return d2.argmin(axis=1)


def test_kmeans_matches_numpy_replica():
    from kgray.stages.similarity import kmeans_embeddings

    out = (
        kmeans_embeddings(SF, k=5, iters=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    raw = pd.read_parquet(SF + "/embeddings.parquet").sort_values(
        "vec_id"
    )
    vecs = np.stack(raw.embedding.to_numpy()).astype(np.float64)
    want = _numpy_kmeans(vecs, k=5, iters=4)
    assert out.cluster.to_numpy().tolist() == want.tolist()
    assert (out.dist >= 0).all()


def test_kmeans_is_deterministic():
    from kgray.stages.similarity import kmeans_embeddings

    a = kmeans_embeddings(SF, k=3, iters=2).to_pandas().sort_values(
        "vec_id"
    )
    b = kmeans_embeddings(SF, k=3, iters=2).to_pandas().sort_values(
        "vec_id"
    )
    assert a.cluster.tolist() == b.cluster.tolist()


def _brute_components(threshold: float):
    raw = pd.read_parquet(SF + "/embeddings.parquet").sort_values(
        "vec_id"
    )
    m = np.stack(raw.embedding.to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sim = m @ m.T
    iu, ju = np.triu_indices(len(m), 1)
    hit = sim[iu, ju] >= threshold
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(iu[hit], ju[hit]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ids = raw.vec_id.to_numpy()
    return {int(ids[i]): int(ids[find(i)]) for i in range(len(ids))}


def test_semantic_dedup_k1_equals_brute_force():
    from kgray.stages.similarity import semantic_dedup

    thr = 0.4
    out = (
        semantic_dedup(SF, k=1, iters=1, threshold=thr)
        .to_pandas()
        .sort_values("vec_id")
    )
    want = _brute_components(thr)
    got = dict(zip(out.vec_id.astype(int), out.rep_id.astype(int)))
    assert got == want


def test_semantic_dedup_within_cluster_complete():
    """Every same-cluster pair above threshold must be linked: rebuild
    the cluster-local candidate set independently and check each found
    pair shares a component representative."""
    from kgray.stages.similarity import kmeans_embeddings, semantic_dedup

    thr = 0.4
    km = kmeans_embeddings(SF, k=4, iters=3).to_pandas()
    sd = semantic_dedup(SF, k=4, iters=3, threshold=thr).to_pandas()
    rep = dict(zip(sd.vec_id.astype(int), sd.rep_id.astype(int)))

    raw = pd.read_parquet(SF + "/embeddings.parquet")
    vec = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in raw.itertuples()
    }
    cl = dict(zip(km.vec_id.astype(int), km.cluster.astype(int)))
    ids = sorted(vec)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if cl[a] != cl[b]:
                continue
            va, vb = vec[a], vec[b]
            cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
            if cos >= thr:
                assert rep[a] == rep[b], (a, b, cos)
