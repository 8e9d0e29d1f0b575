"""Similarity search over an embedding column (list<float>).

- ``knn_cosine``   — brute-force cosine top-k: the query matrix is broadcast
                     once (``ray.put``), every batch does one numpy matmul,
                     emits batch-local top-k, and a tiny groupby reduces to
                     global top-k.  The scalable baseline.
- ``knn_lsh``      — random-hyperplane LSH bucketing: vectors hash to
                     sign-pattern buckets, queries probe their own bucket
                     (+ optional multiprobe), brute force within bucket.
                     The scale path: shuffle moves (bucket, vec) rows only.
- ``embedding_near_dup_pairs`` — cosine-threshold near-duplicate pairs via
                     the same bucketing.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> column — zero-copy
    flatten + reshape for the fixed-dim case (every embedding column),
    falling back to the python path only for ragged lists."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    try:
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), -1).astype(np.float64)
    except ValueError:  # ragged lists
        return np.asarray(arr.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _topk_with_ties(scores: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the top-``kk`` scores INCLUDING every index tied with
    the kk-th score.  A bare argpartition keeps an arbitrary subset of
    cutoff ties, so a block could drop the lowest-id tied neighbor the
    deterministic global reduce (sim DESC, neighbor_id ASC) would rank —
    the ties-inclusive shortlist is a superset of any global top-k."""
    if kk >= len(scores):
        return np.arange(len(scores))
    part = np.argpartition(-scores, kk - 1)[:kk]
    return np.flatnonzero(scores >= scores[part].min())


def knn_cosine(
    embeddings: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """Global top-k cosine neighbours per query.

    Returns (query_id, neighbor_id, rank) with rank 1..k; ties broken by
    ascending neighbor_id (deterministic, matches the SQL oracle).
    """
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((qm, np.asarray(query_ids)))

    # Task pool, not actor pool: the only state is the broadcast query
    # matrix, and ray.get on a local ObjectRef is a zero-copy shared-memory
    # read per batch — an actor pool would add ~2s spin-up for no benefit.
    def batch_topk(batch: pa.Table) -> pa.Table:
        qm_, qids_ = ray.get(q_ref)
        vm = _normalize(_to_matrix(batch.column("embedding")))
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        sims = qm_ @ vm.T  # (Q, B)
        out_q, out_n, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            idx = _topk_with_ties(row, kk)
            for j in idx:
                if exclude_self and vids[j] == qids_[qi]:
                    continue
                out_q.append(qids_[qi])
                out_n.append(vids[j])
                out_s.append(row[j])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["sim", "neighbor_id"], ascending=[False, True]
        ).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return (
        embeddings.map_batches(batch_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pandas")
    )


def knn_cosine_filtered(
    embeddings: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    query_labels: np.ndarray,
    k: int = 5,
    label_col: str = "label",
) -> "ray.data.Dataset":
    """Predicate-filtered exact kNN: top-k cosine neighbours per query
    among corpus vectors whose ``label_col`` DIFFERS from the query's own
    label (cross-label retrieval — hard-negative mining, leakage checks).

    The filter is pushed INTO the per-batch scoring kernel, not applied
    after a larger unfiltered top-k (post-filtering can return < k rows
    whenever a query's k nearest share its label).  Queries are grouped
    by label so each batch builds one column mask per DISTINCT query
    label (a handful), scores the masked submatrix with one matmul slice,
    and emits a ties-inclusive shortlist; the global reduce is the same
    (sim DESC, neighbor_id ASC) deterministic top-k as knn_cosine.
    Returns (query_id, neighbor_id, rank).
    """
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(
        (qm, np.asarray(query_ids), np.asarray(query_labels, dtype=object))
    )

    def batch_topk(batch: pa.Table) -> pa.Table:
        qm_, qids_, qlabels_ = ray.get(q_ref)
        vm = _normalize(_to_matrix(batch.column("embedding")))
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        vlabels = batch.column(label_col).to_numpy(zero_copy_only=False)
        out_q, out_n, out_s = [], [], []
        for lab in pd.unique(qlabels_):
            qsel = np.flatnonzero(qlabels_ == lab)
            vsel = np.flatnonzero(vlabels != lab)
            if len(vsel) == 0:
                continue
            sims = qm_[qsel] @ vm[vsel].T
            kk = min(k, sims.shape[1])
            for row_i, qi in enumerate(qsel):
                row = sims[row_i]
                idx = _topk_with_ties(row, kk)
                out_q.extend([qids_[qi]] * len(idx))
                out_n.extend(vids[vsel[idx]])
                out_s.extend(row[idx])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["sim", "neighbor_id"], ascending=[False, True]
        ).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return (
        embeddings.map_batches(batch_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pandas")
    )


class HyperplaneBucketer:
    """Sign-pattern LSH bucket assignment (state: the hyperplane matrix)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 11):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        signs = (m @ self.planes) >= 0
        return (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column("embedding"))
        return batch.append_column(
            "bucket", pa.array(self.bucket_of(m), pa.int64())
        )


def knn_lsh(
    embeddings: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 11,
) -> "ray.data.Dataset":
    """Approximate top-k: brute force only within each query's LSH bucket.

    One pass: bucket assignment (actor pool) → filter to buckets that hold a
    query → ``groupby(bucket).map_groups`` doing the per-bucket matmul with
    that bucket's queries (broadcast once).  Candidate set per query is
    |corpus| / 2^n_planes; recall < 1 by construction (bucket boundaries) —
    the scale path next to exact ``knn_cosine``.
    """
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    dim = qm.shape[1]
    bucketer = HyperplaneBucketer(dim, n_planes, seed)
    q_buckets = bucketer.bucket_of(qm)
    by_bucket = {}
    for i, b in enumerate(q_buckets):
        by_bucket.setdefault(int(b), []).append(i)
    q_ref = ray.put((qm, np.asarray(query_ids), by_bucket))

    # Task pool: the bucketer's state is one small hyperplane matrix
    # (rebuilt in μs when the instance ships with the task).
    bucketed = embeddings.map_batches(
        HyperplaneBucketer(dim, n_planes, seed), batch_format="pyarrow"
    )

    def only_query_buckets(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        _, _, qmap = ray.get(q_ref)
        wanted = pa.array(np.fromiter(qmap, np.int64), pa.int64())
        return batch.filter(pc.is_in(batch.column("bucket"), value_set=wanted))

    pruned = bucketed.map_batches(only_query_buckets, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        qm_, qids_, qmap = ray.get(q_ref)
        b = int(g["bucket"].iloc[0])
        q_idx = qmap.get(b, [])
        if not q_idx:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "rank": []}
            ).astype("int64")
        m = _normalize(np.asarray(list(g["embedding"]), dtype=np.float64))
        vids = g["vec_id"].to_numpy()
        sims = qm_[q_idx] @ m.T
        rows = {"query_id": [], "neighbor_id": [], "rank": []}
        for row_i, qi in enumerate(q_idx):
            order = sorted(
                range(len(vids)),
                key=lambda j: (-sims[row_i, j], vids[j]),
            )
            rank = 0
            for j in order:
                if vids[j] == qids_[qi]:
                    continue
                rank += 1
                if rank > k:
                    break
                rows["query_id"].append(qids_[qi])
                rows["neighbor_id"].append(vids[j])
                rows["rank"].append(rank)
        return pd.DataFrame(rows).astype("int64")

    return pruned.groupby("bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


class MultiTableBucketer:
    """L independent sign-LSH tables: each vector row explodes into L
    (table_id, bucket, …) rows.  OR-amplification: one agreeing table is
    enough to make a pair candidates — a single table misses near-identical
    vectors whenever one near-tangent hyperplane flips a sign."""

    def __init__(self, dim: int, n_planes: int, n_tables: int, seed: int):
        self.tables = [
            HyperplaneBucketer(dim, n_planes, seed + 1000 * t)
            for t in range(n_tables)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column("embedding"))
        parts = []
        for t, bucketer in enumerate(self.tables):
            parts.append(
                batch.append_column(
                    "table_id", pa.array([t] * batch.num_rows, pa.int32())
                ).append_column(
                    "bucket", pa.array(bucketer.bucket_of(m), pa.int64())
                )
            )
        return pa.concat_tables(parts)


def embedding_near_dup_pairs(
    embeddings: "ray.data.Dataset",
    threshold: float = 0.95,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 11,
    dim: Optional[int] = None,
) -> "ray.data.Dataset":
    """(vec_a < vec_b) pairs with cosine ≥ threshold, blocked by multi-table
    sign-LSH (OR over ``n_tables`` independent tables), exact cosine inside
    each bucket, distinct across tables via a keyed min-aggregate.

    Recall: P(miss) ≈ (1 - a^n_planes)^n_tables for agreement prob
    a = 1 - θ/π; effectively 1.0 for near-identical vectors, deliberately
    approximate for mid-similarity thresholds (the scale path).
    """
    if dim is None:
        first = embeddings.take(1)[0]
        dim = len(first["embedding"])

    bucketed = embeddings.map_batches(
        MultiTableBucketer(dim, n_planes, n_tables, seed),
        batch_format="pyarrow",
    )

    thr = threshold

    def within_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(np.asarray(list(g["embedding"]), dtype=np.float64))
        ids = g["vec_id"].to_numpy()
        sims = m @ m.T
        ia, ib = np.where(np.triu(sims, 1) >= thr)
        a = np.minimum(ids[ia], ids[ib])
        b = np.maximum(ids[ia], ids[ib])
        sim = np.floor(sims[ia, ib] * 10000 + 0.5) / 10000
        return pd.DataFrame({"vec_a": a.astype(np.int64),
                             "vec_b": b.astype(np.int64),
                             "sim": sim})

    from ray.data.aggregate import Min

    typed_empty = ray.data.from_arrow(
        pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
    )
    out = (
        bucketed.groupby(["table_id", "bucket"])
        .map_groups(within_bucket, batch_format="pandas")
        .repartition(4)
        .groupby(["vec_a", "vec_b"])
        .aggregate(Min("sim", alias_name="sim"))  # distinct pairs
    )
    # union with a typed empty block: a no-pairs result keeps its schema
    return typed_empty.union(out)


def embedding_pairs_exact(
    embeddings: "ray.data.Dataset",
    threshold: float = 0.45,
) -> "ray.data.Dataset":
    """EXACT cosine-threshold pairs (vec_a < vec_b) — the ground-truth
    path beside the LSH-blocked ``embedding_near_dup_pairs`` (which may
    miss; this may not).

    Shape: the full normalized matrix is broadcast once (``ray.put``) and
    every batch does one (B × N) matmul against it, emitting only the
    pairs whose smaller id lives in the batch — each pair surfaces exactly
    once with no shuffle at all.  The broadcast is corpus-sized, so this
    is the verification/ground-truth baseline (valid while N×dim floats
    fit in the object store — ~30 GB at 10M×768); the LSH variant is the
    100-TB path."""
    ref_tbl = pa.concat_tables(
        b for b in embeddings.select_columns(
            ["vec_id", "embedding"]
        ).iter_batches(batch_format="pyarrow")
    )
    m = _normalize(_to_matrix(ref_tbl.column("embedding")))
    ids = ref_tbl.column("vec_id").to_numpy(zero_copy_only=False)
    mat_ref = ray.put((m, ids))
    thr = threshold

    def batch_pairs(batch: pa.Table) -> pa.Table:
        all_m, all_ids = ray.get(mat_ref)  # zero-copy numpy views
        bm = _normalize(_to_matrix(batch.column("embedding")))
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        sims = bm @ all_m.T  # (B, N)
        bi, oj = np.where(sims >= thr)
        keep = bids[bi] < all_ids[oj]  # emit once, from the smaller id
        return pa.table(
            {
                "vec_a": pa.array(bids[bi][keep], pa.int64()),
                "vec_b": pa.array(all_ids[oj][keep], pa.int64()),
            }
        )

    typed_empty = ray.data.from_arrow(
        pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
            }
        )
    )
    return typed_empty.union(
        embeddings.map_batches(batch_pairs, batch_format="pyarrow")
    )


def train_ivf_centroids(
    embeddings: "ray.data.Dataset",
    n_centroids: int = 32,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 5,
) -> np.ndarray:
    """Coarse quantizer for IVF: Lloyd's k-means on a BOUNDED sample.

    The sample (``limit(sample_size)``) is the only driver-side data — a
    fixed-size training set, not corpus-sized; production IVF trains the
    same way (faiss trains on a sample).  Returns (n_centroids, dim)
    L2-normalized centroids for cosine/IP search."""
    sample = _to_matrix(
        pa.concat_tables(
            [
                pa.table({"embedding": b.column("embedding")})
                for b in embeddings.limit(sample_size).iter_batches(
                    batch_format="pyarrow"
                )
            ]
        ).column("embedding")
    )
    sample = _normalize(sample)
    rng = np.random.RandomState(seed)
    n_c = min(n_centroids, len(sample))
    cent = sample[rng.choice(len(sample), n_c, replace=False)]
    for _ in range(iters):
        sims = sample @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(n_c):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(
    embeddings: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_centroids: int = 32,
    n_probe: int = 4,
    sample_size: int = 2048,
    seed: int = 5,
) -> "ray.data.Dataset":
    """IVF approximate top-k: coarse k-means lists + multi-probe search.

    The scale path beside ``knn_lsh``: centroids are trained once on a
    bounded sample and broadcast; every vector is assigned to its nearest
    list in one batched matmul (map_batches — the corpus never moves);
    each query probes its ``n_probe`` nearest lists, so the scored
    candidate set is ~``n_probe/n_centroids`` of the corpus; batch-local
    top-k then a tiny keyed reduce, exactly like ``knn_cosine``.  Recall
    < 1 by construction (list boundaries); raise ``n_probe`` to trade
    compute for recall."""
    cent = train_ivf_centroids(
        embeddings, n_centroids, sample_size, seed=seed
    )
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_probe = np.argsort(-(qm @ cent.T), axis=1)[:, :n_probe]  # (Q, P)
    # probe_map: centroid id -> query row indices probing it
    probe_map = {}
    for qi, lists in enumerate(q_probe):
        for c in lists:
            probe_map.setdefault(int(c), []).append(qi)
    state_ref = ray.put((cent, qm, np.asarray(query_ids), probe_map))

    # Task pool (see ``batch_topk``): state is one broadcast tuple read
    # zero-copy from the local object store per batch.
    def ivf_score(batch: pa.Table) -> pa.Table:
        """Assign batch vectors to lists and score them against exactly
        the queries probing those lists."""
        cent_, qm_, qids_, pmap_ = ray.get(state_ref)
        vm = _normalize(_to_matrix(batch.column("embedding")))
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        assign = (vm @ cent_.T).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        for c in np.unique(assign):
            q_idx = pmap_.get(int(c))
            if not q_idx:
                continue
            rows = assign == c
            sub = vm[rows]
            sub_ids = vids[rows]
            sims = qm_[q_idx] @ sub.T  # (q, m)
            kk = min(k + 1, sims.shape[1])
            for r, qi in enumerate(q_idx):
                top = _topk_with_ties(sims[r], kk)
                for j in top:
                    if sub_ids[j] == qids_[qi]:
                        continue
                    out_q.append(qids_[qi])
                    out_n.append(sub_ids[j])
                    out_s.append(sims[r, j])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["sim", "neighbor_id"], ascending=[False, True]
        ).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return (
        embeddings.map_batches(ivf_score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pandas")
    )


def label_centroids(sf_dir: str) -> "ray.data.Dataset":
    """Per-label mean embedding (class centroids), long form:
    (label, dim, centroid) — the aggregation half of nearest-centroid
    classification and the update step of a k-means round.

    Combiner-first vector aggregation: each batch collapses to one
    (sum-vector, count) row per label it contains (one matmul-free numpy
    reduce over the zero-copy (n, dim) matrix), the label-keyed coarse
    reduce sums those — the shuffle moves labels × dim doubles per
    block, never vectors.  Means divide in float64 and round half-up to
    1e-6, mirroring the DuckDB oracle's avg(CAST(e AS DOUBLE)).
    """
    import os

    from ..utils import coarse_grouped_map

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["label", "embedding"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column("embedding"))
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(uniq.astype(np.int64), pa.int64()),
                "n": pa.array(counts, pa.int64()),
                "sums": pa.array(list(sums), pa.list_(pa.float64())),
            }
        )

    def reduce_labels(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("label")
        rows = []
        for label, grp in g:  # labels are class-bounded, not data-bounded
            s = np.sum(np.stack(grp.sums.to_numpy()), axis=0)
            rows.append((int(label), int(grp.n.sum()), s))
        out = pd.DataFrame(rows, columns=["label", "n", "sums"])
        return out

    agg = coarse_grouped_map(
        emb.map_batches(partial, batch_format="pyarrow"),
        "label",
        reduce_labels,
        num_partitions=8,
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in df.iterrows():
            c = np.floor(
                (np.asarray(r.sums) / float(r.n)) * 1e6 + 0.5
            ) / 1e6
            dims = np.arange(1, len(c) + 1, dtype=np.int64)
            out.append(
                pd.DataFrame(
                    {"label": np.int64(r.label), "dim": dims,
                     "centroid": c}
                )
            )
        return pd.concat(out, ignore_index=True)

    return agg.map_batches(finalize, batch_format="pandas",
                           batch_size=None)


def kmeans_embeddings(
    sf_dir: str, k: int = 8, iters: int = 5
) -> "ray.data.Dataset":
    """Full k-means over the embeddings table → (vec_id, cluster, dist):
    the clustering step semantic curation pipelines (SemDeDup-style
    pruning, domain discovery) run over document embeddings.

    Deterministic: centroids initialize to the k smallest vec_ids, every
    iteration is exact float64 — reruns and cluster sizes are
    reproducible, no RNG.  Per iteration: centroids broadcast (k×dim —
    model-sized, the one legitimate broadcast), every batch assigns by
    one matmul argmin and emits per-cluster partial sums (combiner), a
    cluster-keyed coarse reduce finishes the means on k rows.  Empty
    clusters keep their previous centroid.  The corpus is never
    collected; the driver sees k×dim floats per iteration.
    """
    import os

    from ..utils import coarse_grouped_map

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).materialize()  # consumed iters+1 times — pin the read

    seed = emb.filter(expr=f"vec_id < {k}").to_pandas().sort_values(
        "vec_id"
    )
    C = np.asarray(seed.embedding.tolist(), dtype=np.float64)

    def assign(batch: pa.Table, C=None) -> np.ndarray:
        m = _to_matrix(batch.column("embedding"))
        d2 = (
            (m * m).sum(axis=1, keepdims=True)
            - 2.0 * (m @ C.T)
            + (C * C).sum(axis=1)
        )
        return m, d2

    for _ in range(iters):
        cref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            Ci = ray.get(cref)
            m, d2 = assign(batch, Ci)
            a = d2.argmin(axis=1)
            sums = np.zeros((Ci.shape[0], m.shape[1]), dtype=np.float64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=Ci.shape[0]).astype(
                np.int64
            )
            keep = counts > 0
            return pa.table(
                {
                    "cluster": pa.array(
                        np.nonzero(keep)[0].astype(np.int64), pa.int64()
                    ),
                    "n": pa.array(counts[keep], pa.int64()),
                    "sums": pa.array(
                        list(sums[keep]), pa.list_(pa.float64())
                    ),
                }
            )

        def reduce_clusters(df: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for c, grp in df.groupby("cluster"):  # ≤ k groups
                rows.append(
                    (int(c), int(grp.n.sum()),
                     np.sum(np.stack(grp.sums.to_numpy()), axis=0))
                )
            return pd.DataFrame(rows, columns=["cluster", "n", "sums"])

        agg = coarse_grouped_map(
            emb.map_batches(partial, batch_format="pyarrow"),
            "cluster",
            reduce_clusters,
            num_partitions=4,
        ).to_pandas()  # k rows
        newC = C.copy()
        for _, r in agg.iterrows():
            newC[int(r.cluster)] = np.asarray(r.sums) / float(r.n)
        C = newC

    cref = ray.put(C)

    def final_assign(batch: pa.Table) -> pa.Table:
        Ci = ray.get(cref)
        m, d2 = assign(batch, Ci)
        a = d2.argmin(axis=1)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "dist": pa.array(
                    np.sqrt(np.maximum(d2[np.arange(len(a)), a], 0.0)),
                    pa.float64(),
                ),
            }
        )

    return emb.map_batches(final_assign, batch_format="pyarrow")


def semantic_dedup(
    sf_dir: str,
    k: int = 8,
    iters: int = 5,
    threshold: float = 0.95,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with k-means, find
    cosine ≥ threshold pairs WITHIN each cluster only, keep one
    representative per connected component → (vec_id, rep_id).

    The clustering is what makes the pairwise step tractable: candidate
    generation is cluster-local (Σ nᵢ² instead of n²), the documented
    approximation being cross-cluster near-dups (near-identical vectors
    co-cluster, so recall loss concentrates at the threshold boundary).
    The vector payload reaches its cluster through a vec_id-keyed
    repartition join of the assignment against the embedding table —
    no driver-side collection at any point: components solve through
    the distributed min-label propagation and the vec_id→rep mapping
    comes back via one left repartition join (same tail as
    near_dup_groups — dedup.components_assign).
    """
    from .dedup import components_assign
    from ..utils import coarse_grouped_map, repartition_join

    assigned = kmeans_embeddings(sf_dir, k=k, iters=iters)

    import os

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    with_vecs = repartition_join(
        assigned.select_columns(["vec_id", "cluster"]),
        emb,
        "vec_id",
        "vec_id",
        {"vec_id": pa.int64(), "cluster": pa.int64()},
        {"vec_id": pa.int64(), "embedding": pa.list_(pa.float32())},
        num_partitions=8,
    )

    def cluster_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in df.groupby("cluster"):
            ids = grp.vec_id.to_numpy()
            if len(ids) < 2:
                continue
            m = np.stack(
                [np.asarray(e, dtype=np.float64)
                 for e in grp.embedding.to_numpy()]
            )
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sim = m @ m.T
            iu, ju = np.triu_indices(len(ids), 1)
            hit = sim[iu, ju] >= threshold
            for a, b in zip(ids[iu[hit]], ids[ju[hit]]):
                out.append((min(int(a), int(b)), max(int(a), int(b))))
        return pd.DataFrame(out, columns=["doc_a", "doc_b"]).astype(
            "int64"
        )

    pairs = coarse_grouped_map(
        with_vecs,
        "cluster",
        cluster_pairs,
        num_partitions=4,
    )
    return components_assign(
        emb.select_columns(["vec_id"]), pairs, id_col="vec_id"
    )


# ---------------------------------------------------------------------------
# Distributed covariance matrix + PCA spectrum
# ---------------------------------------------------------------------------

def embedding_covariance(sf_dir: str) -> "ray.data.Dataset":
    """Population covariance matrix of the embedding columns, as
    (i, j, cov) rows with 1-based dimension indices.

    One streaming pass: each batch emits its moment sketch (n, Σx,
    Σx⊗x) — dim + dim² floats regardless of batch size — and the
    driver folds the per-batch sketches with the closed form
    cov = E[xy] − E[x]E[y].  Nothing data-sized ever leaves the
    workers; the result is DIMENSION-bounded (dim² rows).  Float32
    inputs are widened to float64 before any arithmetic, matching the
    oracle's per-value DOUBLE cast; cov is rounded half-up to 6
    decimals (streaming-vs-closed-form accumulation differs in the
    last ulps).
    """
    import os

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )

    def sketch(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column("embedding"))
        return pa.table(
            {
                "n": pa.array([m.shape[0]], pa.int64()),
                "s": pa.array([m.sum(axis=0).tolist()],
                              pa.list_(pa.float64())),
                "p": pa.array([(m.T @ m).ravel().tolist()],
                              pa.list_(pa.float64())),
            }
        )

    parts = emb.map_batches(sketch, batch_format="pyarrow").to_pandas()
    n = float(parts.n.sum())
    s = np.sum(np.stack(parts.s.to_numpy()), axis=0)
    p = np.sum(np.stack(parts.p.to_numpy()), axis=0)
    d = s.shape[0]
    mean = s / n
    cov = p.reshape(d, d) / n - np.outer(mean, mean)
    ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1),
                         indexing="ij")
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "i": ii.ravel().astype(np.int64),
                "j": jj.ravel().astype(np.int64),
                "cov": np.floor(cov.ravel() * 1e6 + 0.5) / 1e6,
            }
        )
    )


def pca_spectrum(sf_dir: str, k: int = 8) -> "ray.data.Dataset":
    """Top-``k`` PCA eigenvalues of the embedding covariance with
    cumulative explained-variance ratios.

    Reuses embedding_covariance's one-pass distributed moment sketch;
    the eigendecomposition runs on the driver over the dim x dim
    matrix — dimension-bounded work, legitimate at any corpus size.
    (No SQL oracle: eigendecomposition is not expressible in DuckDB;
    correctness is pinned by pytest against numpy over the raw rows.)
    """
    cov_rows = embedding_covariance(sf_dir).to_pandas()
    d = int(cov_rows.i.max())
    cov = np.zeros((d, d))
    cov[cov_rows.i.to_numpy() - 1, cov_rows.j.to_numpy() - 1] = \
        cov_rows["cov"].to_numpy()  # .cov attribute is the DataFrame method
    vals = np.linalg.eigvalsh(cov)[::-1]
    total = vals.sum()
    top = vals[:k]
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "rnk": np.arange(1, len(top) + 1, dtype=np.int64),
                "eigenvalue": top,
                "explained_ratio": top / total,
                "cum_explained_ratio": np.cumsum(top) / total,
            }
        )
    )


# ---------------------------------------------------------------------------
# Maximum inner product search (un-normalized retrieval)
# ---------------------------------------------------------------------------

def mips_topk(
    embeddings: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """Global top-k by raw INNER PRODUCT per query (MIPS — the retrieval
    kernel for un-normalized embedding spaces, where magnitude carries
    signal and cosine's normalization is wrong).  Same two-stage shape
    as ``knn_cosine``: broadcast query matrix, per-batch matmul +
    argpartition, tiny per-query reduce; ties by ascending neighbor_id.
    """
    qm = np.asarray(queries, dtype=np.float64)
    q_ref = ray.put((qm, np.asarray(query_ids)))

    def batch_topk(batch: pa.Table) -> pa.Table:
        qm_, qids_ = ray.get(q_ref)
        vm = _to_matrix(batch.column("embedding")).astype(np.float64)
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        sims = qm_ @ vm.T
        out_q, out_n, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            idx = _topk_with_ties(row, kk)
            for j in idx:
                if exclude_self and vids[j] == qids_[qi]:
                    continue
                out_q.append(qids_[qi])
                out_n.append(vids[j])
                out_s.append(row[j])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["sim", "neighbor_id"], ascending=[False, True]
        ).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    from ..utils import coarse_grouped_map

    return coarse_grouped_map(
        embeddings.map_batches(batch_topk, batch_format="pyarrow"),
        "query_id",
        lambda df: df.groupby("query_id", group_keys=False)[
            ["query_id", "neighbor_id", "sim"]
        ].apply(reduce_topk),
        num_partitions=8,
    )


# ---------------------------------------------------------------------------
# Symmetric int8 quantization with exact error accounting
# ---------------------------------------------------------------------------

def quantize_int8(sf_dir: str) -> "ray.data.Dataset":
    """Per-vector int8-quantization error audit → (vec_id, n_clipped,
    qerr_sq): symmetric per-DIMENSION scales (global max|x_d| / 127),
    round-half-up quantization clipped to [-127, 127], and the
    reconstruction error reported as an EXACT integer —
    sum_d floor(err_d·1e9 + 0.5)² — so the oracle comparison has zero
    FP-summation-order slack (the audit a serving stack runs before
    shipping a quantized index).

    Two passes: (1) per-batch per-dimension |max| partials (one dim²-free
    numpy max per batch; driver reduces blocks×64 floats) broadcast via
    ray.put; (2) pure map quantizes and integerizes the error.  No
    shuffle at all.
    """
    import os

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )

    def max_partial(batch: pa.Table) -> pa.Table:
        m = np.abs(_to_matrix(batch.column("embedding"))).max(axis=0)
        return pa.table(
            {
                "dim": pa.array(np.arange(len(m), dtype=np.int64)),
                "mx": pa.array(m.astype(np.float64)),
            }
        )

    mx = emb.map_batches(
        max_partial, batch_format="pyarrow"
    ).to_pandas()
    scale = (
        mx.groupby("dim").mx.max().sort_index().to_numpy() / 127.0
    )
    s_ref = ray.put(scale)

    def quant(batch: pa.Table) -> pa.Table:
        s = ray.get(s_ref)
        x = _to_matrix(batch.column("embedding")).astype(np.float64)
        safe = np.where(s == 0.0, 1.0, s)
        q = np.clip(np.floor(x / safe + 0.5), -127, 127)
        q = np.where(s == 0.0, 0.0, q)
        err = x - q * s
        err_fp = np.floor(err * 1e9 + 0.5).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "n_clipped": pa.array(
                    (np.abs(np.floor(x / safe + 0.5)) > 127).sum(axis=1)
                    .astype(np.int64)
                ),
                "qerr_sq": pa.array((err_fp * err_fp).sum(axis=1)),
            }
        )

    return emb.map_batches(quant, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN
# ---------------------------------------------------------------------------

def train_pq_codebooks(
    embeddings: "ray.data.Dataset",
    n_subspaces: int = 8,
    n_codes: int = 16,
    iters: int = 8,
    sample_cap: int = 4096,
    seed: int = 13,
) -> np.ndarray:
    """PQ codebooks (n_subspaces, n_codes, sub_dim): per-subspace k-means
    on a deterministic bounded sample (hash-ordered first ``sample_cap``
    vectors — same bounded-sample posture as train_ivf_centroids).
    Lloyd iterations are numpy on the driver over the CAPPED sample;
    the expensive part (encoding the corpus) stays distributed."""
    cap = embeddings.limit(sample_cap).to_pandas()
    m = np.asarray(cap.embedding.tolist(), dtype=np.float64)
    n, d = m.shape
    sub = d // n_subspaces
    rng = np.random.RandomState(seed)
    books = np.zeros((n_subspaces, n_codes, sub))
    for s in range(n_subspaces):
        x = m[:, s * sub : (s + 1) * sub]
        idx = rng.choice(n, size=min(n_codes, n), replace=False)
        c = x[idx].copy()
        for _ in range(iters):
            dist = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = dist.argmin(axis=1)
            for j in range(len(c)):
                pts = x[a == j]
                if len(pts):
                    c[j] = pts.mean(axis=0)
        books[s, : len(c)] = c
    return books


def knn_pq(
    embeddings: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_subspaces: int = 8,
    n_codes: int = 16,
) -> "ray.data.Dataset":
    """Approximate top-k by PQ asymmetric distance (ADC): vectors are
    encoded to one uint8 code per subspace against broadcast codebooks;
    each query precomputes a (n_subspaces × n_codes) lookup table of
    partial squared distances, so scoring a vector is ``sub`` table
    lookups instead of a d-dim dot product — the memory-bound regime
    ANN serving actually runs in.  ADC prunes each block to an
    ``8·k`` shortlist which is then EXACTLY re-ranked against the raw
    vectors still in the batch (the standard PQ + re-rank serving
    design: compressed-domain scan, exact math only on the shortlist).
    Same broadcast + per-batch top-k + keyed reduce shape as
    knn_cosine; approximate by construction — recall is bounded by
    whether the true neighbours survive the ADC pruning, pinned by the
    pytest rather than an oracle.
    """
    books = train_pq_codebooks(
        embeddings, n_subspaces=n_subspaces, n_codes=n_codes
    )
    qm = np.asarray(queries, dtype=np.float64)
    sub = books.shape[2]
    # per-query LUT: lut[q, s, c] = ||query_sub - codeword||²
    lut = np.zeros((len(qm), n_subspaces, books.shape[1]))
    for s in range(n_subspaces):
        qs = qm[:, s * sub : (s + 1) * sub]
        diff = qs[:, None, :] - books[s][None, :, :]
        lut[:, s, :] = (diff ** 2).sum(axis=2)
    state = ray.put((books, lut, qm, np.asarray(query_ids)))
    shortlist = 8 * k

    def batch_topk(batch: pa.Table) -> pa.Table:
        books_, lut_, qm_, qids_ = ray.get(state)
        x = _to_matrix(batch.column("embedding")).astype(np.float64)
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        ns, nc, sd = books_.shape
        codes = np.zeros((len(x), ns), dtype=np.int64)
        for s in range(ns):
            xs = x[:, s * sd : (s + 1) * sd]
            dist = (
                (xs ** 2).sum(axis=1)[:, None]
                - 2.0 * xs @ books_[s].T
                + (books_[s] ** 2).sum(axis=1)[None, :]
            )
            codes[:, s] = dist.argmin(axis=1)
        # ADC: gather per-subspace partials from each query's LUT, prune
        # to a shortlist, then exact re-rank the shortlist only
        n_q = lut_.shape[0]
        out = []
        for qi in range(n_q):
            d = lut_[qi][np.arange(ns)[None, :], codes].sum(axis=1)
            kk = min(shortlist + 1, len(d))
            idx = np.argpartition(d, kk - 1)[:kk]
            exact = ((x[idx] - qm_[qi]) ** 2).sum(axis=1)
            top = np.argsort(exact)[: k + 1]
            for t in top:
                j = idx[t]
                if vids[j] == qids_[qi]:
                    continue
                out.append((qids_[qi], vids[j], exact[t]))
        if not out:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "dist": pa.array([], pa.float64())}
            )
        q, nb, dd = zip(*out)
        return pa.table(
            {
                "query_id": pa.array(list(q), pa.int64()),
                "neighbor_id": pa.array(list(nb), pa.int64()),
                "dist": pa.array(list(dd), pa.float64()),
            }
        )

    def reduce_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in df.groupby("query_id"):
            g = g.sort_values(
                ["dist", "neighbor_id"], ascending=[True, True]
            ).head(k)
            g = g.copy()
            g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
            out.append(g[["query_id", "neighbor_id", "rank"]])
        return pd.concat(out) if out else pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "neighbor_id": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64")}
        )

    from ..utils import coarse_grouped_map

    return coarse_grouped_map(
        embeddings.map_batches(batch_topk, batch_format="pyarrow"),
        "query_id",
        reduce_topk,
        num_partitions=8,
    )


def knn_label_purity(
    sf_dir: str, k: int = 5, n_queries: int = 200
) -> "ray.data.Dataset":
    """Embedding-space quality metric: for a deterministic query sample
    (vec_id < ``n_queries``), the fraction of each query's ``k`` cosine
    neighbours sharing the query's label, aggregated per label →
    (label, n_pairs, purity) — the eval a team runs on a new embedding
    model before re-indexing the corpus with it.

    Exact brute force over the corpus for the SAMPLED queries only
    (broadcast query matrix, per-batch matmul + per-query top-k, tiny
    keyed reduces) — the sample bound keeps the exact eval linear in
    corpus size; the production-scale variant would run the same
    reduction over knn_ivf/knn_pq candidates instead.
    """
    import os

    import pyarrow.parquet as pq

    from ..utils import coarse_grouped_map

    # only the SAMPLED query rows reach the driver: the predicate is
    # pushed into the parquet read (row-group pruning), never a full-table
    # driver read of an sf-scaling table
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
        filters=[("vec_id", "<", n_queries)],
    )
    vid = np.asarray(t.column("vec_id").to_pylist())
    lab = np.asarray(t.column("label").to_pylist())
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    qm = _normalize(emb)
    q_ref = ray.put((qm, vid, lab))

    emb_ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
    )

    def batch_topk(batch: pa.Table) -> pa.Table:
        qm_, qids_, qlabs_ = ray.get(q_ref)
        vm = _normalize(_to_matrix(batch.column("embedding")))
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        vlabs = batch.column("label").to_numpy(zero_copy_only=False)
        sims = qm_ @ vm.T
        out_q, out_n, out_s, out_ql, out_nl = [], [], [], [], []
        kk = min(k + 1, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            idx = _topk_with_ties(row, kk)
            for j in idx:
                if vids[j] == qids_[qi]:
                    continue
                out_q.append(qids_[qi])
                out_n.append(vids[j])
                out_s.append(row[j])
                out_ql.append(qlabs_[qi])
                out_nl.append(vlabs[j])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
                "qlabel": pa.array(np.array(out_ql, np.int64)),
                "nlabel": pa.array(np.array(out_nl, np.int64)),
            }
        )

    def per_query(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in df.groupby("query_id", sort=False):
            g = g.sort_values(
                ["sim", "neighbor_id"], ascending=[False, True]
            ).head(k)
            out.append(
                pd.DataFrame(
                    {
                        "label": g.qlabel.astype(np.int64),
                        "hit": (g.nlabel == g.qlabel).astype(np.int64),
                    }
                )
            )
        return pd.concat(out) if out else pd.DataFrame(
            {"label": pd.Series([], dtype="int64"),
             "hit": pd.Series([], dtype="int64")}
        )

    hits = coarse_grouped_map(
        emb_ds.map_batches(batch_topk, batch_format="pyarrow"),
        "query_id",
        per_query,
        num_partitions=8,
    )

    def purity(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("label", as_index=False).agg(
            n_pairs=("hit", "size"), hits=("hit", "sum")
        )
        return pd.DataFrame(
            {
                "label": g.label.astype(np.int64),
                "n_pairs": g.n_pairs.astype(np.int64),
                "purity": g.hits.to_numpy(np.float64)
                / g.n_pairs.to_numpy(np.float64),
            }
        )

    return coarse_grouped_map(hits, "label", purity, num_partitions=8)
